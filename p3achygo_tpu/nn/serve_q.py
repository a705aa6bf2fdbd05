"""int8-ACTIVATION serving graph (ROOFLINE.md lever #1; the TRT-int8
analogue of cc/nn/engine/trt_engine.cc + trt_calibrator.cc:15-74).

The b12c128btl3 forward is HBM-bandwidth-bound (ROOFLINE.md: 217.5 ms
measured vs a 144-175 ms bf16 floor at W=15360). Weight-only int8 cannot
move that — the binding byte stream is the ACTIVATIONS. This graph stores
the trunk's inter-fusion activation streams in int8, halving the bound
side; the projected ceiling is ~5-6x baseline (memo §3.1).

Scheme (standard post-training quantization, reference calibrator
parity: trt_calibrator.cc computes per-tensor activation ranges from
calibration batches; here the ranges come from a jitted record pass):

* Weights: BN folded into the producer conv exactly as nn/serve.py, then
  symmetric per-output-channel int8 (the reference's TRT engine uses the
  same weight scheme).
* Activations: symmetric per-tensor int8 with STATIC scales calibrated
  as a high quantile of |x| over calibration positions (record mode).
  Quant sites: every trunk conv input (the mish outputs) and, with
  ``residual_int8``, the residual stream at each block boundary.
* Convolutions: s8 x s8 -> s32 (``preferred_element_type=int32``) on the
  MXU; dequant + bias + mish + requant ride the conv's output fusion as
  one elementwise chain. ``native=False`` runs the identical integer
  math through an f32 conv — BIT-EXACT (worst-case accumulator
  576*127*127 < 2^24, exact in f32), so CPU tests lock the TPU path.
* Heads + broadcast mix stay bf16 (small streams; the score head reads
  pooled vectors, not the spatial stream) via nn/serve.py run_heads.

Parity: tests/test_serve_q.py (emulated==native math, top-1 agreement
vs the bf16 folded graph, scale-pytree traced — no per-net recompiles).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from p3achygo_tpu.models.blocks import mish
from p3achygo_tpu.models.model import ModelOutputs
from p3achygo_tpu.nn.serve import (_CB, _affine, _conv, _dense, run_heads,
                                   serve_supported, _DN)

# Calibration quantile of |x| per site: clips the far mish tail (a few
# outliers per 10^6 activations) instead of stretching the int8 grid.
CALIB_Q = 99.97


def q_supported(config) -> bool:
    return serve_supported(config)


def _quant_w(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8; returns (w8, scale[oc])."""
    red = tuple(range(w.ndim - 1))
    s = jnp.max(jnp.abs(w), axis=red) / 127.0
    s = jnp.maximum(s, 1e-12)
    w8 = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return w8, s.astype(jnp.float32)


def _quant_a(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)


def _conv_i8(x8: jnp.ndarray, w8: jnp.ndarray, native: bool) -> jnp.ndarray:
    """s8 x s8 conv -> s32 (native) or exact f32 emulation (tests)."""
    if native:
        return lax.conv_general_dilated(
            x8, w8, (1, 1), "SAME", dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
    y = lax.conv_general_dilated(
        x8.astype(jnp.float32), w8.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=_DN)
    return jnp.round(y).astype(jnp.int32)


class _Ctx:
    """Walk context: either records per-site |x| quantiles (calibration)
    or consumes the calibrated scale pytree (quantized serving)."""

    def __init__(self, scales: Optional[Dict[str, jnp.ndarray]],
                 native: bool):
        self.record = scales is None
        self.scales = {} if self.record else scales
        self.native = native

    def scale(self, site: str, x: jnp.ndarray) -> jnp.ndarray:
        if self.record:
            s = jnp.maximum(
                jnp.percentile(jnp.abs(x.astype(jnp.float32)), CALIB_Q),
                1e-6) / 127.0
            self.scales[site] = s
            return s
        return self.scales[site]


def _chain_q(x, cbs: Sequence[_CB], site: str, ctx: _Ctx, dtype):
    """nn/serve.py _chain with int8 activation streams.

    x arrives in bf16 (dequantized residual read). The chain-head BN
    stays an explicit affine; every conv input u_i is quantized at its
    calibrated site scale; each conv's following BN is folded into its
    weights before weight quantization; dequant+bias+mish+requant form
    the conv-output elementwise fusion. The final conv's output returns
    in f32 (the residual add / caller decides its storage)."""
    a0, b0 = _affine(cbs[0].bn_p, cbs[0].bn_s)
    u = mish(x.astype(jnp.float32) * a0 + b0)
    for i, cb in enumerate(cbs):
        w = cb.kernel.astype(jnp.float32)
        bias = None
        if i + 1 < len(cbs):
            a_n, b_n = _affine(cbs[i + 1].bn_p, cbs[i + 1].bn_s)
            w = w * a_n
            bias = b_n
        s_in = ctx.scale(f"{site}.u{i}", u)
        if ctx.record:
            # Calibration runs the fold math in f32 (no quant noise in
            # the recorded ranges downstream).
            y = _conv(u, w, jnp.float32,
                      None if bias is None else bias)
        else:
            w8, s_w = _quant_w(w)
            u8 = _quant_a(u, s_in)
            y = _conv_i8(u8, w8, ctx.native).astype(jnp.float32)
            y = y * (s_in * s_w)
            if bias is not None:
                y = y + bias
        if i + 1 < len(cbs):
            u = mish(y)
    return y


def _btl_q(x, p, s, inner: int, site: str, ctx: _Ctx, dtype):
    cbs = [_CB(p["reduce"], s["reduce"])]
    cbs += [_CB(p[f"inner_{j}"], s[f"inner_{j}"]) for j in range(inner)]
    cbs += [_CB(p["expand"], s["expand"])]
    return _chain_q(x, cbs, site, ctx, dtype)


def _classic_q(x, p, s, stack: int, site: str, ctx: _Ctx, dtype):
    cbs = [_CB(p[f"conv_{j}"], s[f"conv_{j}"]) for j in range(stack)]
    return _chain_q(x, cbs, site, ctx, dtype)


def _nbt_q(x, p, s, site: str, ctx: _Ctx, dtype):
    h = _chain_q(x, [_CB(p["reduce"], s["reduce"])], f"{site}.r", ctx, dtype)
    for r in ("nbt_res0", "nbt_res1"):
        cbs = [_CB(p[r][f"conv_{j}"], s[r][f"conv_{j}"]) for j in range(2)]
        h = h + _chain_q(h, cbs, f"{site}.{r}", ctx, dtype)
    return _chain_q(h, [_CB(p["expand"], s["expand"])], f"{site}.e", ctx,
                    dtype)


def _broadcast_q(x, p, s, site: str, ctx: _Ctx, dtype):
    """Broadcast mix block: conv_first/conv_last quantized, the
    position-mix dense stays bf16 (channel-shared [361,361] matmul —
    per-channel weight scales don't apply and its stream is one conv's
    worth; nn/serve.py:130-141)."""
    u = _chain_q(x, [_CB(p["conv_first"], s["conv_first"])], f"{site}.f",
                 ctx, dtype)
    n, h, w, c = u.shape
    m = mish(u).astype(dtype)
    m = jnp.transpose(m, (0, 3, 1, 2)).reshape(n, c, h * w)
    z = _dense(m, p["mix"]["Dense_0"], dtype)
    z = jnp.transpose(z.reshape(n, c, h, w), (0, 2, 3, 1))
    return _chain_q(z, [_CB(p["conv_last"], s["conv_last"])], f"{site}.l",
                    ctx, dtype)


def serve_q_forward(model, variables, board_state, game_state,
                    scales: Optional[Dict[str, jnp.ndarray]] = None,
                    want_optimistic: bool = False,
                    native: bool = True,
                    residual_int8: bool = True):
    """int8-activation forward. With ``scales=None`` runs in RECORD mode:
    f32 folded math, returns (ModelOutputs, site->scale dict) for
    calibration. With a scale pytree, runs quantized and returns
    ModelOutputs. ``native=False`` emulates the integer convs exactly in
    f32 (CPU tests). ``residual_int8`` also stores the block-boundary
    residual stream in int8 (one extra requant per block)."""
    cfg = model.config
    dtype = model.dtype
    params = variables["params"]
    stats = variables["batch_stats"]
    if not q_supported(cfg):
        raise ValueError("serve_q_forward: conv trunks only")
    ctx = _Ctx(scales, native)

    board_state = board_state.astype(dtype)
    game_state = game_state.astype(dtype)
    x = _conv(board_state, params["init_board_conv"]["kernel"], dtype)
    x = x + _dense(game_state, params["init_game_layer"],
                   dtype)[:, None, None, :]
    x = x.astype(jnp.float32)

    def requant_res(x, site):
        """Residual stream storage at a block boundary."""
        if not residual_int8:
            return x.astype(dtype).astype(jnp.float32)
        s_x = ctx.scale(site, x)
        if ctx.record:
            return x
        return _quant_a(x, s_x).astype(jnp.float32) * s_x

    x = requant_res(x, "res_in")
    inner = cfg.inner_bottleneck_layers
    for i in range(cfg.blocks):
        if i % cfg.broadcast_interval == cfg.broadcast_interval - 1:
            d = _broadcast_q(x, params[f"broadcast_res_{i}"],
                             stats[f"broadcast_res_{i}"], f"b{i}", ctx,
                             dtype)
        elif cfg.trunk_block_type == "btl":
            d = _btl_q(x, params[f"bottleneck_res_{i}"],
                       stats[f"bottleneck_res_{i}"], inner, f"b{i}", ctx,
                       dtype)
        elif cfg.trunk_block_type == "classic":
            d = _classic_q(x, params[f"classic_res_{i}"],
                           stats[f"classic_res_{i}"], 2, f"b{i}", ctx,
                           dtype)
        elif cfg.trunk_block_type == "nbt":
            d = _nbt_q(x, params[f"nbt_res_{i}"], stats[f"nbt_res_{i}"],
                       f"b{i}", ctx, dtype)
        else:
            raise ValueError(cfg.trunk_block_type)
        x = requant_res(x + d, f"res{i}")

    out = run_heads(params, stats, x.astype(dtype), dtype, want_optimistic)
    if ctx.record:
        return out, ctx.scales
    return out


def calibrate(model, variables, planes, scalars,
              want_optimistic: bool = False,
              residual_int8: bool = True) -> Dict[str, jnp.ndarray]:
    """One-shot scale calibration from a batch of real positions (the
    trt_calibrator.cc analogue). Jittable; returns the scale pytree that
    serve_q_forward consumes as a traced argument."""
    _, scales = serve_q_forward(model, variables, planes, scalars,
                                scales=None,
                                want_optimistic=want_optimistic,
                                residual_int8=residual_int8)
    return scales
