"""Model zoo exports (reference torchrec/models/__init__.py)."""
from torchrec_tpu.models.bert4rec import BERT4Rec, ndcg_at_k, recall_at_k
from torchrec_tpu.models.deepfm import SimpleDeepFMNN
from torchrec_tpu.models.two_tower import (
    TwoTower,
    knn,
    two_tower_in_batch_negatives_loss,
)
from torchrec_tpu.models.dlrm import (
    DLRM,
    DLRM_DCN,
    DLRM_Projection,
    DLRM_Transformer,
    DLRMTrain,
    DenseArch,
    InteractionArch,
    InteractionDCNArch,
    InteractionProjectionArch,
    InteractionTransformerArch,
    OverArch,
    SparseArch,
    bce_with_logits,
)

__all__ = [
    "BERT4Rec",
    "ndcg_at_k",
    "recall_at_k",
    "SimpleDeepFMNN",
    "TwoTower",
    "knn",
    "two_tower_in_batch_negatives_loss",
    "DLRM",
    "DLRM_DCN",
    "DLRM_Projection",
    "DLRM_Transformer",
    "DLRMTrain",
    "DenseArch",
    "InteractionArch",
    "InteractionDCNArch",
    "InteractionProjectionArch",
    "InteractionTransformerArch",
    "OverArch",
    "SparseArch",
    "bce_with_logits",
]
