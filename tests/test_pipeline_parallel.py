"""Pipeline parallelism (maglev analog): 1F1B grads == single-device grads.

Reference analog: torchrec/distributed/maglev tests (stage-sharded step vs
the sequential composed model).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.distributed.pipeline_parallel import (
    MaglevPipeline,
    PipelineStage,
)


def make_stages():
    def s0_init(key):
        return {"w": jax.random.normal(key, (8, 16)) * 0.1}

    def s0_apply(p, x):
        return jax.nn.relu(x @ p["w"])

    def s1_init(key):
        return {"w": jax.random.normal(key, (16, 16)) * 0.1}

    def s1_apply(p, x):
        return jax.nn.relu(x @ p["w"])

    def s2_init(key):
        return {"w": jax.random.normal(key, (16, 1)) * 0.1}

    def s2_apply(p, x, labels):
        logits = (x @ p["w"]).squeeze(-1)
        return jnp.mean((logits - labels) ** 2)

    return [
        PipelineStage(s0_init, s0_apply),
        PipelineStage(s1_init, s1_apply),
        PipelineStage(s2_init, s2_apply, has_loss=True),
    ]


def reference_loss(params, x, labels):
    h = jax.nn.relu(x @ params[0]["w"])
    h = jax.nn.relu(h @ params[1]["w"])
    logits = (h @ params[2]["w"]).squeeze(-1)
    return jnp.mean((logits - labels) ** 2)


def test_1f1b_matches_single_device():
    stages = make_stages()
    pipe = MaglevPipeline(stages, devices=jax.devices()[:3])
    params = pipe.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    m, b = 4, 8
    mbs = [jnp.asarray(rng.normal(size=(b, 8)).astype(np.float32)) for _ in range(m)]
    labs = [jnp.asarray(rng.normal(size=(b,)).astype(np.float32)) for _ in range(m)]

    grads, loss = pipe.train_step(params, mbs, labs)

    # reference: same params, sum of per-microbatch grads, mean loss
    host_params = jax.device_get(params)
    ref_losses, ref_grads = [], None
    for x, y in zip(mbs, labs):
        l, g = jax.value_and_grad(
            lambda ps: reference_loss(ps, x, y)
        )(host_params)
        ref_losses.append(float(l))
        ref_grads = g if ref_grads is None else jax.tree_util.tree_map(
            jnp.add, ref_grads, g
        )

    np.testing.assert_allclose(float(loss), np.mean(ref_losses), rtol=1e-5)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(grads[i]["w"]), np.asarray(ref_grads[i]["w"]),
            rtol=1e-4, atol=1e-5, err_msg=f"stage {i}",
        )


def test_pipeline_forward_and_training_progress():
    stages = make_stages()
    pipe = MaglevPipeline(stages, devices=jax.devices()[:3])
    params = pipe.init(jax.random.key(1))
    rng = np.random.default_rng(1)
    mbs = [jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32)) for _ in range(2)]
    labs = [jnp.asarray(rng.normal(size=(8,)).astype(np.float32)) for _ in range(2)]

    losses = []
    for _ in range(10):
        grads, loss = pipe.train_step(params, mbs, labs)
        losses.append(float(loss))
        params = [
            jax.tree_util.tree_map(lambda p, g: p - 0.05 * g / 2, params[i], grads[i])
            for i in range(3)
        ]
    assert losses[-1] < losses[0]
    out = pipe.forward(params, mbs[0])
    assert out.shape == (8, 16)


def test_requires_loss_stage():
    stages = make_stages()
    with pytest.raises(ValueError):
        MaglevPipeline(stages[:2], devices=jax.devices()[:2])
