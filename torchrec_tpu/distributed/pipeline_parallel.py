"""Pipeline parallelism ("maglev" analog): stage-sharded models with
1F1B microbatching.

Capability parity with torchrec/distributed/maglev/ (MaglevPipeline
pipeline.py:20 — stages on disjoint rank groups, positional activation/
gradient hand-off on direction-split process groups, run_1f1b
microbatching; StageParallelizer stage.py:159 — per-stage parallelization
strategy with once-per-step gradient reduction).

TPU-first design: no process groups, no NCCL stream plumbing —

* each stage's params live on its own device (or its own sub-mesh); the
  host enqueues per-(stage, microbatch) jitted calls, and JAX's async
  dispatch + per-device execution queues realize the pipeline schedule
  from dataflow alone: a stage starts the moment its input transfer
  lands, exactly the wave the reference builds by hand with matched
  send/recv (pipeline.py docstring, sections on deadlock avoidance).
* activation/gradient hand-off is ``jax.device_put`` between stage
  devices (ICI transfer) — direction-split communicators are unnecessary
  because transfers are independent dataflow edges, not collectives.
* gradients accumulate across microbatches per stage and reduce/apply
  once per step (the reference's reduce-once invariant, stage.py:159).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["PipelineStage", "MaglevPipeline"]


@dataclasses.dataclass(frozen=True)
class PipelineStage:
    """One stage: pure ``init(key) -> params`` + ``apply(params, x) -> y``.

    The final stage's ``apply`` receives (params, x, labels) and must
    return a scalar loss if ``has_loss``.
    """

    init: Callable[[jax.Array], Any]
    apply: Callable[..., Any]
    has_loss: bool = False


class MaglevPipeline:
    """Host-driven 1F1B pipeline over per-stage devices.

    ``devices``: one device per stage (a stage may also be a sharded
    sub-program internally; the hand-off only needs the boundary arrays).
    """

    def __init__(
        self,
        stages: Sequence[PipelineStage],
        devices: Optional[Sequence[jax.Device]] = None,
    ):
        if not stages:
            raise ValueError("at least one stage")
        if not stages[-1].has_loss:
            raise ValueError("last stage must compute the loss (has_loss)")
        self.stages = list(stages)
        devices = list(devices or jax.devices())[: len(stages)]
        if len(devices) < len(stages):
            raise ValueError(
                f"{len(stages)} stages need {len(stages)} devices, "
                f"got {len(devices)}"
            )
        self.devices = devices
        s = len(stages)
        # jitted per-stage forward (returning residuals for backward) and
        # backward (cotangent in, (param grads, input cotangent) out)
        self._fwd = []
        self._bwd = []
        for i, stage in enumerate(self.stages):
            last = i == s - 1

            # the backward recomputes the stage forward (stage-level
            # rematerialization — the standard TPU pipeline memory trade:
            # only boundary activations are stored per in-flight microbatch)
            def fwd_only(params, x, labels=None, _apply=stage.apply, _last=last):
                return _apply(params, x, labels) if _last else _apply(params, x)

            def bwd(params, x, g, labels=None, _apply=stage.apply, _last=last):
                if _last:
                    out, vjp = jax.vjp(lambda p, a: _apply(p, a, labels), params, x)
                    dp, dx = vjp(jnp.ones_like(out))
                else:
                    out, vjp = jax.vjp(_apply, params, x)
                    dp, dx = vjp(g)
                return dp, dx

            # no explicit device pinning: inputs are device_put onto the
            # stage's device, and jit follows its inputs' committed placement
            self._fwd.append(jax.jit(fwd_only))
            self._bwd.append(jax.jit(bwd))

    def init(self, key: jax.Array) -> List[Any]:
        """Per-stage params, placed on their stage devices."""
        params = []
        for i, stage in enumerate(self.stages):
            p = stage.init(jax.random.fold_in(key, i))
            params.append(jax.device_put(p, self.devices[i]))
        return params

    def train_step(
        self,
        params: List[Any],
        microbatches: Sequence[Any],
        labels: Sequence[Any],
    ) -> Tuple[List[Any], jnp.ndarray]:
        """One 1F1B step over the microbatches.

        Returns (per-stage gradient pytrees summed over microbatches,
        mean loss). The optimizer applies OUTSIDE, once per step — the
        reference's reduce-once invariant.
        """
        s = len(self.stages)
        m = len(microbatches)
        # enqueue forwards in pipeline order; async dispatch overlaps
        # stage i's mb j with stage i-1's mb j+1 automatically
        acts: List[List[Any]] = [[None] * (s + 1) for _ in range(m)]
        for j in range(m):
            acts[j][0] = jax.device_put(microbatches[j], self.devices[0])
        lab_dev = [
            jax.device_put(labels[j], self.devices[s - 1]) for j in range(m)
        ]
        losses = [None] * m
        # 1F1B enqueue order: warmup fwds then alternate bwd/fwd
        grads: List[Any] = [None] * s
        order: List[Tuple[str, int]] = []
        for j in range(min(s, m)):
            order.append(("fwd", j))
        nf, nb = min(s, m), 0
        while nb < m:
            order.append(("bwd", nb))
            nb += 1
            if nf < m:
                order.append(("fwd", nf))
                nf += 1

        # acts[j][i] = input of stage i for microbatch j, on stage i's device
        def run_fwd(j):
            for i in range(s - 1):
                out = self._fwd[i](params[i], acts[j][i])
                acts[j][i + 1] = jax.device_put(out, self.devices[i + 1])
            losses[j] = self._fwd[s - 1](params[s - 1], acts[j][s - 1], lab_dev[j])

        def run_bwd(j):
            g = None
            for i in reversed(range(s)):
                if i == s - 1:
                    dp, dx = self._bwd[i](params[i], acts[j][i], None, lab_dev[j])
                else:
                    dp, dx = self._bwd[i](
                        params[i], acts[j][i], jax.device_put(g, self.devices[i])
                    )
                g = dx
                grads[i] = dp if grads[i] is None else jax.tree_util.tree_map(
                    jnp.add, grads[i], dp
                )
                acts[j][i] = None  # release the residual

        for kind, j in order:
            (run_fwd if kind == "fwd" else run_bwd)(j)

        loss = jnp.mean(jnp.stack([jax.device_put(l, self.devices[-1]) for l in losses]))
        return grads, loss

    def forward(self, params: List[Any], x: Any) -> Any:
        """Inference pass through all stages. A loss-bearing final stage
        (``has_loss``, apply = (params, x, labels) -> loss) cannot run
        without labels, so it is skipped and its INPUT (the logits feeding
        the loss) is returned; a plain final stage is applied like any
        other — previously it was unconditionally skipped, returning the
        penultimate activation for pure-inference pipelines."""
        last = len(self.stages) - 1
        for i in range(len(self.stages)):
            if i == last and self.stages[i].has_loss:
                break
            x = self._fwd[i](params[i], x)
            if i + 1 < len(self.stages):
                x = jax.device_put(x, self.devices[i + 1])
        return x
