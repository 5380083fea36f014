"""Per-op device-time profile of the headline bench (methodology tool).

jax.profiler traces WORK through the axon tunnel (CLAUDE.md measurement
rules): this runs one profiled multi-epoch execution of bench.py's train
scan on the real chip, parses the vm.trace.json.gz device track, and
prints the top op names by device time normalized to us/step — the
ground truth that replaces guessing when choosing the next kernel to
attack (component-wise wall timings DO NOT add up; XLA fuses across op
boundaries, so confirm any conclusion with an in-context A/B on bench.py).

Usage (real TPU):
    python benchmarks/profile_bench.py [scale] [top_k]
"""

import collections
import glob
import gzip
import json
import os
import shutil
import sys

TRACE_DIR = "/tmp/torchrec_tpu_trace"


def run_traced(scale: int, variant: str = "") -> int:
    """One profiled bench execution; returns total steps traced."""
    import jax
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    weighted = variant == "weighted"
    bf16_sr = variant == "bf16sr"
    rowwise = variant in ("rowwise", "rowwise_colo")
    colo = variant == "rowwise_colo"
    two_features = variant == "multifeature"
    bench.set_scale(scale)
    ebc, params, opt, states, rows = bench.build(weighted, two_features, bf16_sr, rowwise, colo)
    values_stack, weights_stack, kjt_proto = bench.make_epoch_batches(
        rows, weighted=weighted, two_features=two_features
    )

    # same scan-of-scans harness as bench.main, one traced execution
    import dataclasses  # noqa: F401  (parity with bench.main imports)

    from torchrec_tpu.sparse import KeyedJaggedTensor

    keys = kjt_proto.keys()
    lengths_const = kjt_proto.lengths()
    total_dim = bench.DIM * len(keys)
    import jax.numpy as jnp

    def one_step(carry, batch):
        params, states = carry
        values, w = batch if weighted else (batch, None)
        kjt = KeyedJaggedTensor(
            keys=keys, values=values, lengths=lengths_const, weights=w
        )
        kt = ebc.apply(params, kjt)
        cot = jnp.ones((bench.BATCH, total_dim), kt.values().dtype) + 0.0 * kt.values()
        params, states = ebc.apply_gradients(params, states, opt, kjt, cot)
        return (params, states), kt.values()[0, 0]

    if weighted:
        values_stack = (values_stack, weights_stack)

    n_epochs = 20

    @jax.jit
    def run(params, states, values_stack):
        (params, states), probe = jax.lax.scan(
            lambda c, _: jax.lax.scan(one_step, c, values_stack),
            (params, states),
            None,
            length=n_epochs,
        )
        return params, states, probe

    def sync(x):
        return float(np.asarray(x.ravel()[0]))

    # compile + warm
    params, states, probe = run(params, states, values_stack)
    sync(probe)

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        params, states, probe = run(params, states, values_stack)
        sync(probe)
    return n_epochs * bench.BATCHES_PER_EPOCH


def report(steps: int, top_k: int) -> None:
    files = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise SystemExit(f"no trace files under {TRACE_DIR}")
    f = files[-1]
    with gzip.open(f) as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n.lower()}
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    total = sum(dur.values())
    print(
        f"== {f}\n   total device us {total:.0f} over {len(dur)} op names, "
        f"{steps} steps -> {total / steps:.1f} us/step device-busy"
    )
    for name, d in dur.most_common(top_k):
        print(f"  {d / steps:8.1f} us/step  x{cnt[name] / steps:7.1f}  {name}")


if __name__ == "__main__":
    args = sys.argv[1:]
    variant = ""
    if args and args[-1] in ("weighted", "multifeature", "bf16sr", "rowwise", "rowwise_colo"):
        variant = args.pop()
    scale = int(args[0]) if len(args) > 0 else 128
    top_k = int(args[1]) if len(args) > 1 else 30
    steps = run_traced(scale, variant)
    report(steps, top_k)
