"""int8-activation serving graph checks (p3achygo_tpu/nn/serve_q.py).

Locks three properties: (1) calibration produces sane traced scales,
(2) the f32-emulated integer path is BIT-EXACT vs the native s8 conv
path where the backend supports s8 convs (the emulation is how CPU CI
vouches for the TPU path), (3) quantized outputs track the bf16 folded
graph closely on the positions the scales were calibrated on. Mirrors
the reference's engine-parity + calibrator checks
(cc/nn/engine/compare_engines.cc, trt_calibrator.cc)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p3achygo_tpu.models import build_model, get_config, init_params
from p3achygo_tpu.nn.serve import serve_forward
from p3achygo_tpu.nn.serve_q import calibrate, q_supported, serve_q_forward
from tests.test_serve_fold import (_cfg, _inputs, _randomized_params,
                                   _randomized_stats)


def _net(config_name, seed=0, dtype=jnp.float32):
    cfg = _cfg(config_name)
    model = build_model(cfg, dtype=dtype)
    variables = _randomized_params(
        _randomized_stats(init_params(model, jax.random.PRNGKey(seed)),
                          seed=7), seed=11)
    return model, variables


@pytest.mark.parametrize("config_name", ["tiny", "b8c64"])
def test_calibrate_scales(config_name):
    model, variables = _net(config_name)
    planes, scalars = _inputs(8, seed=3)
    scales = jax.jit(lambda p, s: calibrate(model, variables, p, s))(
        planes, scalars)
    assert len(scales) > 0
    for k, v in scales.items():
        assert np.asarray(v).shape == ()
        assert float(v) > 0, k


@pytest.mark.parametrize("residual_int8", [True, False])
def test_quant_tracks_folded_graph(residual_int8):
    model, variables = _net("b8c64")
    planes, scalars = _inputs(16, seed=5)
    scales = calibrate(model, variables, planes, scalars,
                       residual_int8=residual_int8)

    ref = serve_forward(model, variables, planes, scalars)
    got = serve_q_forward(model, variables, planes, scalars, scales=scales,
                          native=False, residual_int8=residual_int8)

    pi_r = np.asarray(ref.pi_logits, np.float32).ravel()
    pi_q = np.asarray(got.pi_logits, np.float32).ravel()
    corr = np.corrcoef(pi_r, pi_q)[0, 1]
    assert corr > 0.99, corr
    np.testing.assert_allclose(np.asarray(got.outcome_probs),
                               np.asarray(ref.outcome_probs), atol=0.06)
    np.testing.assert_allclose(np.asarray(got.score_probs),
                               np.asarray(ref.score_probs), atol=0.05)


def test_native_matches_emulated_when_supported():
    """s8xs8->s32 conv == exact f32 emulation (sums < 2^24). If this
    backend can't lower s8 convs, skip — the TPU path is exercised by
    benchmarks/int8_serve_probe.py on the chip."""
    model, variables = _net("tiny")
    planes, scalars = _inputs(4, seed=9)
    scales = calibrate(model, variables, planes, scalars)
    try:
        nat = serve_q_forward(model, variables, planes, scalars,
                              scales=scales, native=True)
        nat_pi = np.asarray(nat.pi_logits)
    except Exception:
        pytest.skip("backend lacks s8 conv support")
    emu = serve_q_forward(model, variables, planes, scalars,
                          scales=scales, native=False)
    np.testing.assert_allclose(nat_pi, np.asarray(emu.pi_logits),
                               atol=1e-4, rtol=1e-5)


def test_scales_are_traced_arguments():
    """The scale pytree rides as a traced arg: one compile serves
    different calibrations (per-generation recompiles stay eliminated)."""
    model, variables = _net("tiny")
    planes, scalars = _inputs(4, seed=1)
    s1 = calibrate(model, variables, planes, scalars)
    s2 = {k: v * 1.5 for k, v in s1.items()}
    f = jax.jit(lambda sc, p, g: serve_q_forward(
        model, variables, p, g, scales=sc, native=False))
    o1 = f(s1, planes, scalars)
    o2 = f(s2, planes, scalars)
    assert np.isfinite(np.asarray(o1.pi_logits)).all()
    assert np.isfinite(np.asarray(o2.pi_logits)).all()
    assert not np.allclose(np.asarray(o1.pi_logits),
                           np.asarray(o2.pi_logits))
