"""Fused Pallas trunk v2 (interleaved layout) parity vs the flax graph.

p3achygo_tpu/nn/trunk_kernel2.py must reproduce the flax trunk's outputs
through the full model: same weights, BN folded, broadcast blocks in XLA
between segment kernels. Mirrors the reference's engine parity checks
(compare_engines.cc)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p3achygo_tpu.models import build_model, get_config, init_params
from p3achygo_tpu.nn.trunk_kernel import trunk_supported
from p3achygo_tpu.nn.trunk_kernel2 import _plan_segments, build_trunk_fn_v2


def _randomized_stats(variables, seed):
    k = [jax.random.PRNGKey(seed)]

    def rnd(x):
        k[0], sub = jax.random.split(k[0])
        return x + jax.random.uniform(sub, x.shape, jnp.float32, 0.01, 0.4)

    stats = jax.tree_util.tree_map(rnd, variables["batch_stats"])
    return {**variables, "batch_stats": stats}


def test_plan_segments():
    assert _plan_segments(("btl", "btl", "bc", "btl")) == [
        ("btl", 0, 2), ("bc", 2, 1), ("btl", 3, 1)]
    assert _plan_segments(("bc",)) == [("bc", 0, 1)]


@pytest.mark.parametrize("config_name", ["b8c64", "b12c128btl3"])
def test_trunk_kernel2_matches_flax(config_name):
    cfg = get_config(config_name)
    assert trunk_supported(cfg)
    model = build_model(cfg, dtype=jnp.bfloat16)
    variables = _randomized_stats(init_params(model, jax.random.PRNGKey(0)),
                                  seed=7)

    N = 4
    rng = np.random.default_rng(3)
    planes = jnp.asarray(rng.normal(size=(N, 19, 19, 15)) > 1.0,
                         jnp.float32)
    scalars = jnp.asarray(rng.normal(size=(N, 8)) * 0.3, jnp.float32)

    ref = model.apply(variables, planes, scalars, train=False)
    trunk_fn = build_trunk_fn_v2(cfg, variables, interpret=True)
    got = model.apply(variables, planes, scalars, train=False,
                      trunk_fn=trunk_fn)

    np.testing.assert_allclose(np.asarray(got.pi_logits),
                               np.asarray(ref.pi_logits),
                               atol=0.15, rtol=0.05)
    np.testing.assert_allclose(np.asarray(got.outcome_probs),
                               np.asarray(ref.outcome_probs), atol=0.03)
    np.testing.assert_allclose(np.asarray(got.score_probs),
                               np.asarray(ref.score_probs), atol=0.02)
    assert (np.argmax(np.asarray(got.pi_logits), -1)
            == np.argmax(np.asarray(ref.pi_logits), -1)).all()


def test_trunk_kernel2_f32_reference_tight():
    cfg = get_config("b8c64")
    model32 = build_model(cfg, dtype=jnp.float32)
    variables = _randomized_stats(init_params(model32,
                                              jax.random.PRNGKey(1)), seed=9)
    N = 2
    rng = np.random.default_rng(5)
    planes = jnp.asarray(rng.normal(size=(N, 19, 19, 15)) > 1.2,
                         jnp.float32)
    scalars = jnp.zeros((N, 8), jnp.float32)

    ref = model32.apply(variables, planes, scalars, train=False)
    trunk_fn = build_trunk_fn_v2(cfg, variables, interpret=True)
    got = model32.apply(variables, planes, scalars, train=False,
                        trunk_fn=trunk_fn)
    np.testing.assert_allclose(np.asarray(got.pi_logits),
                               np.asarray(ref.pi_logits),
                               atol=0.25, rtol=0.08)
    assert (np.argmax(np.asarray(got.pi_logits), -1)
            == np.argmax(np.asarray(ref.pi_logits), -1)).all()


def test_trunk_fn_v2_batch_padding():
    """N not divisible by GROUP pads up and slices back."""
    cfg = get_config("b8c64")
    model = build_model(cfg, dtype=jnp.bfloat16)
    variables = init_params(model, jax.random.PRNGKey(2))
    trunk_fn = build_trunk_fn_v2(cfg, variables, interpret=True)
    x = jnp.ones((3, 19, 19, cfg.channels), jnp.bfloat16)
    out = trunk_fn(x)
    assert out.shape == (3, 19, 19, cfg.channels)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
