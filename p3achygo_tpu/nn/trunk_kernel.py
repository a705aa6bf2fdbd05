"""Fused Pallas forward of the residual trunk (serving path).

Replaces the reference's TensorRT serving engine (cc/nn/engine/
trt_engine.cc: fused + BN-folded fp16 inference) with a TPU-native fused
kernel: the ENTIRE trunk of a btl/broadcast network runs in one
pallas_call — one HBM read of the stem output and one HBM write of the
trunk output per batch tile, with every BatchNorm folded to a per-channel
affine and all weights resident in VMEM.

Why: the flax trunk at search width W=15360 spends ~250 of 324 ms in
elementwise BN/mish fusions BETWEEN convs (benchmarks/trace_model.py) —
each of the ~50 pre-activation ConvBlocks streams the full [W,361,C]
activation tensor through HBM twice. Fusing the trunk cuts that traffic
to the kernel's in/out blocks.

Layout: boards are flattened to 361 positions padded to 384 rows (24
sublanes of 16 for bf16 tiling); 3x3 convs become ONE [M, 9*Cb] x
[9*Cb, Cb] MXU matmul over 9 statically rolled-and-masked copies of the
activation rows (the roll crosses board boundaries only in rows that the
edge masks zero or the 23 pad rows absorb — see _edge_masks). The
broadcast block's position-mixing Dense (blocks.py Broadcast) is a
per-board [384,384] x [384,C] matmul.

Inference-only: training uses the differentiable flax graph; search
evals swap this in via P3achyGoModel.__call__(trunk_fn=...). Parity is
locked by tests/test_trunk_kernel.py (interpret mode on CPU vs flax).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BOARD = 19
POS = BOARD * BOARD  # 361
PPAD = 384  # positions padded to 24 x 16 sublanes (bf16 tiling)
# 3x3 neighborhood offsets in (di, dj); row offset = di * 19 + dj.
OFFSETS = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]
BN_EPS = 1e-3


def trunk_supported(config) -> bool:
    """The fused kernel covers btl trunks with broadcast blocks (the
    production families b12c128btl3 / b8c64); other trunk types fall back
    to the flax graph."""
    return (not getattr(config, "is_transformer", False)
            and config.trunk_block_type == "btl")


def _mish_f32(x):
    """mish on f32 (models/blocks.py mish — same 1-exp formula)."""
    t = jnp.exp(-jnp.abs(x))
    pos = (1.0 + 2.0 * t) / (1.0 + 2.0 * t + 2.0 * t * t)
    neg = (t * t + 2.0 * t) / (t * t + 2.0 * t + 2.0)
    return x * jnp.where(x >= 0, pos, neg)


def _fold_bn(params, stats):
    """BatchNorm(inference) == a*x + b per channel."""
    inv = jax.lax.rsqrt(stats["var"] + BN_EPS)
    a = params["scale"] * inv
    b = params["bias"] - stats["mean"] * a
    return a.astype(jnp.float32), b.astype(jnp.float32)


def _conv_block_w(p, s, kernel_size):
    """(a, b, W) for one ConvBlock; 3x3 kernels packed to [9*Cin, Cout]
    in OFFSETS order, 1x1 to [Cin, Cout]."""
    a, b = _fold_bn(p["BatchNorm_0"], s["BatchNorm_0"])
    w = p["Conv_0"]["kernel"]
    if kernel_size == 1:
        wm = w[0, 0]
    else:
        wm = jnp.concatenate([w[di + 1, dj + 1] for (di, dj) in OFFSETS],
                             axis=0)
    return a[None, :], b[None, :], wm.astype(jnp.bfloat16)


def build_trunk_weights(config, variables) -> Tuple[Tuple[str, ...],
                                                    List[jnp.ndarray]]:
    """Flatten the trunk's folded weights into (block kinds, arrays).

    Array order per btl block: r_a, r_b, Wr, [i_a, i_b, W9] * inner,
    e_a, e_b, We. Per broadcast block: f_a, f_b, Wf, WdT_pad, bd_pad,
    l_a, l_b, Wl.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    kinds = []
    arrs: List[jnp.ndarray] = []
    inner = config.inner_bottleneck_layers
    for i in range(config.blocks):
        if i % config.broadcast_interval == config.broadcast_interval - 1:
            name = f"broadcast_res_{i}"
            p, s = params[name], stats[name]
            kinds.append("bc")
            arrs.extend(_conv_block_w(p["conv_first"], s["conv_first"], 1))
            wd = p["mix"]["Dense_0"]["kernel"]  # [361, 361] pos -> pos'
            bd = p["mix"]["Dense_0"]["bias"]  # [361]
            wdt = jnp.zeros((PPAD, PPAD), jnp.float32)
            wdt = wdt.at[:POS, :POS].set(wd.T)  # z[p'] = sum_p WdT[p',p] m[p]
            bdp = jnp.zeros((PPAD, 1), jnp.float32).at[:POS, 0].set(bd)
            arrs.append(wdt.astype(jnp.bfloat16))
            arrs.append(bdp)
            arrs.extend(_conv_block_w(p["conv_last"], s["conv_last"], 1))
        else:
            name = f"bottleneck_res_{i}"
            p, s = params[name], stats[name]
            kinds.append("btl")
            arrs.extend(_conv_block_w(p["reduce"], s["reduce"], 1))
            for j in range(inner):
                arrs.extend(_conv_block_w(p[f"inner_{j}"], s[f"inner_{j}"],
                                          config.conv_size))
            arrs.extend(_conv_block_w(p["expand"], s["expand"], 1))
    return tuple(kinds), arrs


def _edge_masks(m_rows: int) -> List[jnp.ndarray]:
    """[M, 1] f32 mask per OFFSET: 1 where the shifted source position is
    a real on-board neighbor. Rows >= 361 within each 384-row board slot
    are pad (always 0), so rolls that cross board slots only ever
    contribute through masked-off rows."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 1), 0) % PPAD
    i = pos // BOARD
    j = pos % BOARD
    on = pos < POS
    masks = []
    for (di, dj) in OFFSETS:
        ok = on & (i + di >= 0) & (i + di < BOARD) \
            & (j + dj >= 0) & (j + dj < BOARD)
        masks.append(ok.astype(jnp.bfloat16))
    return masks


def _bn_mish(x_bf16, a, b):
    """Folded-BN + mish, computed in f32 (registers), back to bf16."""
    h = x_bf16.astype(jnp.float32) * a + b
    return _mish_f32(h).astype(jnp.bfloat16)


def _make_kernel(kinds: Tuple[str, ...], inner: int, n_tile: int,
                 channels: int, bottleneck: int, interpret: bool):
    M = n_tile * PPAD
    # Static-shift circular roll. pltpu.roll lowers to tpu.dynamic_rotate,
    # which Mosaic rejects for 16-bit data ("Rotate with non-32-bit
    # data"); jnp.roll with a static shift lowers to two static slices +
    # concat, which Mosaic handles for bf16.
    # (A shift of 0 must bypass jnp.roll: its slice decomposition emits a
    # zero-sized vector Mosaic rejects.)
    roll = lambda x, s: x if s % M == 0 else jnp.roll(x, s, axis=0)

    def kernel(x_ref, *w_refs):
        w_refs, out_ref = w_refs[:-1], w_refs[-1]
        masks = _edge_masks(M)
        x = x_ref[:].reshape(M, channels)
        wi = 0

        def take():
            nonlocal wi
            r = w_refs[wi]
            wi += 1
            return r[:]

        for kind in kinds:
            if kind == "btl":
                r_a, r_b, wr = take(), take(), take()
                h = jnp.dot(_bn_mish(x, r_a, r_b), wr,
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
                for _ in range(inner):
                    i_a, i_b, w9 = take(), take(), take()
                    t = _bn_mish(h, i_a, i_b)
                    shifted = [
                        roll(t, -(di * BOARD + dj)) * masks[o]
                        for o, (di, dj) in enumerate(OFFSETS)
                    ]
                    x9 = jnp.concatenate(shifted, axis=1)
                    h = jnp.dot(x9, w9,
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
                e_a, e_b, we = take(), take(), take()
                y = jnp.dot(_bn_mish(h, e_a, e_b), we,
                            preferred_element_type=jnp.float32)
                x = (x.astype(jnp.float32) + y).astype(jnp.bfloat16)
            else:  # broadcast
                f_a, f_b, wf = take(), take(), take()
                h = jnp.dot(_bn_mish(x, f_a, f_b), wf,
                            preferred_element_type=jnp.float32)
                m = _mish_f32(h).astype(jnp.bfloat16)
                wdt, bd = take(), take()
                m3 = m.reshape(n_tile, PPAD, channels)
                zs = []
                for nb in range(n_tile):
                    zn = jnp.dot(wdt, m3[nb],
                                 preferred_element_type=jnp.float32)
                    zs.append((zn + bd).astype(jnp.bfloat16))
                z = jnp.stack(zs, axis=0).reshape(M, channels)
                l_a, l_b, wl = take(), take(), take()
                y = jnp.dot(_bn_mish(z, l_a, l_b), wl,
                            preferred_element_type=jnp.float32)
                x = (x.astype(jnp.float32) + y).astype(jnp.bfloat16)
        out_ref[:] = x.reshape(n_tile, PPAD, channels)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("kinds", "inner", "n_tile", "channels",
                                    "bottleneck", "interpret"))
def _trunk_call(x_pad, kinds, inner, n_tile, channels, bottleneck,
                interpret, *arrs):
    N = x_pad.shape[0]
    grid = (N // n_tile,)
    kern = _make_kernel(kinds, inner, n_tile, channels, bottleneck,
                        interpret)

    def w_spec(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, (lambda i, _nd=nd: (0,) * _nd),
                            memory_space=pltpu.VMEM)

    w_specs = [w_spec(a) for a in arrs]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, PPAD, channels), jnp.bfloat16),
        grid=grid,
        in_specs=[pl.BlockSpec((n_tile, PPAD, channels),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec((n_tile, PPAD, channels),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_pad, *arrs)


def build_trunk_fn(config, variables, n_tile: int = 8,
                   interpret: bool = None):
    """-> trunk_fn(x [N,19,19,C] bf16) -> [N,19,19,C] bf16.

    Pass as P3achyGoModel.__call__(..., trunk_fn=...). Weights fold from
    `variables` in-graph (cheap per-channel ops; `variables` may be a
    traced value — golden weights swap per generation without a rebuild).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    kinds, arrs = build_trunk_weights(config, variables)
    channels = config.channels
    inner = config.inner_bottleneck_layers
    bottleneck = config.bottleneck_channels

    def trunk_fn(x):
        N = x.shape[0]
        nt = min(n_tile, N)
        n_up = -(-N // nt) * nt  # pad the batch up; pad boards are sliced off
        xf = x.reshape(N, POS, channels).astype(jnp.bfloat16)
        x_pad = jnp.zeros((n_up, PPAD, channels), jnp.bfloat16)
        x_pad = x_pad.at[:N, :POS, :].set(xf)
        out = _trunk_call(x_pad, kinds, inner, nt, channels, bottleneck,
                          interpret, *arrs)
        return out[:N, :POS, :].reshape(N, BOARD, BOARD, channels)

    return trunk_fn
