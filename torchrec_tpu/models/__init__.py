from torchrec_tpu.models.dlrm import (
    DLRM,
    DLRM_DCN,
    DLRM_Projection,
    DLRMTrain,
    DenseArch,
    InteractionArch,
    InteractionDCNArch,
    InteractionProjectionArch,
    OverArch,
    SparseArch,
    bce_with_logits,
)

__all__ = [
    "DLRM",
    "DLRM_DCN",
    "DLRM_Projection",
    "DLRMTrain",
    "DenseArch",
    "InteractionArch",
    "InteractionDCNArch",
    "InteractionProjectionArch",
    "OverArch",
    "SparseArch",
    "bce_with_logits",
]
