"""Planner cost-model constants for TPU hardware.

Role parity with torchrec/distributed/planner/constants.py:16-46 (which
encodes A100-class numbers: HBM 897 GB/s, intra-node 600 GB/s, cross-node
12.5 GB/s, bwd = 2x fwd). These are TPU-measured/spec ballparks — cost
RATIOS drive placement decisions, absolute accuracy matters less.
"""

GiB = 1024**3

# generation -> (hbm_bytes, hbm_gbps, ici_gbps, vmem_bytes)
TPU_GENERATIONS = {
    # v5e: 16 GiB HBM2 @ ~819 GB/s, ICI ~1.6 Tb/s aggregate per chip
    "v5e": dict(hbm=16 * GiB, hbm_bw=819e9, ici_bw=180e9, vmem=128 * 1024**2),
    # v5p: 95 GiB HBM2e @ ~2.77 TB/s, 3D torus ICI
    "v5p": dict(hbm=95 * GiB, hbm_bw=2765e9, ici_bw=540e9, vmem=128 * 1024**2),
    "v4": dict(hbm=32 * GiB, hbm_bw=1228e9, ici_bw=270e9, vmem=128 * 1024**2),
    "v6e": dict(hbm=32 * GiB, hbm_bw=1640e9, ici_bw=360e9, vmem=128 * 1024**2),
}

DEFAULT_GENERATION = "v5e"

# host interconnect (multi-slice / multi-host)
DCN_BW = 25e9  # bytes/s per host
# host DRAM tier (UVM analog: pinned_host offload)
DDR_MEM_BW = 100e9
DDR_CAP = 512 * GiB
# local NVMe tier behind SSD virtual-table kernels (reference models SSD
# TBE the same way: a slow backing store behind a DRAM/HBM cache)
SSD_BW = 2e9
SSD_CAP = 4096 * GiB

# backward touches the row twice (grad scatter + optimizer state): the
# reference models bwd as 2x fwd compute (constants.py:26)
BACKWARD_COMPUTE_MULTIPLIER = 2.0

# issue-rate floors, measured on v5e at the headline bench (CLAUDE.md
# device profile): XLA row gathers issue at ~12-20 ns/row regardless of
# table size, and narrow-row lookups are issue-bound, not bandwidth-bound.
# Calibrated against the measured profile (106.5k ids/step):
#   fwd gather+pool 0.27 ms -> ~2.5 ns/id
#   bwd sort+count+dedup+write+optim ~1.03 ms -> ~9.7 ns/id
# The perf estimator takes max(bandwidth term, issue term) per pass; a
# validation test (tests/test_planner.py) pins the prediction within 2x of
# the measured BENCH number.
FWD_ISSUE_S_PER_ROW = 2.5e-9
BWD_ISSUE_S_PER_ROW = 9.7e-9

# overhead per XLA kernel dispatch involved in a lookup pass (seconds)
KERNEL_OVERHEAD_S = 2e-6

# default per-feature pooling factor when constraints don't say
POOLING_FACTOR = 1.0

# column-wise block minimum width (lane tile)
MIN_CW_DIM = 128

# fraction of HBM the storage reservation keeps for dense params,
# activations and XLA scratch by default
DEFAULT_RESERVE_PERCENT = 0.15

# bytes of optimizer state per element, by fused optimizer family
OPTIMIZER_STATE_MULTIPLIER = {
    "sgd": 0.0,
    "rowwise_adagrad": 1.0 / 128,  # one fp32 scalar per row (dim-normalized est.)
    "adam": 2.0,
    "partial_rowwise_adam": 1.0,
}
