"""Fused Pallas trunk v2: 16-board interleaved layout, shift-free 3x3.

Round-3's fused trunk (nn/trunk_kernel.py) was parity-correct but 2x
SLOWER than flax at W=15360: with boards laid out one-per-384-rows, the
nine 3x3 taps needed row rolls by +-1..+-20 — none a multiple of the
bf16 sublane tile (16) — so Mosaic inserted a full-tile relayout shuffle
per tap per inner conv (~9 x 27 convs per pass). v2 removes every
relayout by construction:

  INTERLEAVED LAYOUT: a grid step owns G=16 boards stored as
  [368 positions, 16 boards, C] — row index = pos * 16 + board. A shift
  by `s` board positions is a roll by 16*s rows: ALWAYS tile-aligned for
  bf16 (16, 128) tiles, so Mosaic lowers it to plain aligned copies.

  SEGMENTS: the kernel fuses each run of consecutive bottleneck blocks
  (between broadcast blocks). Broadcast blocks' position-mixing Dense
  contracts over positions ACROSS the row-tiling — cheap in XLA (one
  einsum on the same interleaved layout), a relayout minefield in
  Mosaic — so they stay XLA ops between segment calls. HBM cost: one
  activation read+write per segment instead of two per ConvBlock.

  ACCUMULATED TAPS: inner 3x3 convs accumulate nine [M,Cb]x[Cb,Cb]
  matmuls. The dot runs FIRST and the roll applies to its output
  (roll(t,-s) @ W == roll(t @ W, -s); the edge mask is a per-row scalar
  so it commutes too): exactly one [M,Cb] intermediate is live per tap,
  vs nine rolled inputs (50.5 MB, past the 16 MB scoped-VMEM limit) or
  a [M, 9*Cb] concat.

Semantics mirror cc/nn/engine/trt_engine.cc's role (fused, BN-folded
serving engine); weight folding reuses trunk_kernel.build_trunk_weights
(models/blocks.py pre-activation ConvBlock: BN -> mish -> conv).
Inference-only; parity locked by tests/test_trunk_kernel2.py (interpret
mode vs the flax trunk).
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from p3achygo_tpu.nn.trunk_kernel import (
    BN_EPS, BOARD, OFFSETS, POS, _fold_bn, _mish_f32, build_trunk_weights,
    trunk_supported)

GROUP = 16  # boards interleaved per grid step == bf16 sublane tile
PPOS = 368  # positions padded to a multiple of GROUP (23 * 16)


def _plan_segments(kinds: Sequence[str]) -> List[Tuple[str, int, int]]:
    """[(kind, start_block, n_blocks)] with consecutive btl runs merged."""
    plan: List[Tuple[str, int, int]] = []
    i = 0
    while i < len(kinds):
        if kinds[i] == "btl":
            j = i
            while j < len(kinds) and kinds[j] == "btl":
                j += 1
            plan.append(("btl", i, j - i))
            i = j
        else:
            plan.append(("bc", i, 1))
            i += 1
    return plan


def _edge_masks_interleaved(m_rows: int) -> List[jnp.ndarray]:
    """[M, 1] bf16 mask per OFFSET; row -> (pos = row // GROUP, board)."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 1), 0) // GROUP
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
    h = x_bf16.astype(jnp.float32) * a + b
    return _mish_f32(h).astype(jnp.bfloat16)


def _make_segment_kernel(n_blocks: int, inner: int, channels: int):
    """Kernel over one [1, PPOS, GROUP, C] block: `n_blocks` consecutive
    bottleneck residual blocks, weights VMEM-resident."""
    M = PPOS * GROUP

    def kernel(x_ref, *refs):
        w_refs, out_ref = refs[:-1], refs[-1]
        masks = _edge_masks_interleaved(M)
        on = (jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) // GROUP
              < POS).astype(jnp.bfloat16)
        x = x_ref[:].reshape(M, channels)
        wi = 0

        def take():
            nonlocal wi
            r = w_refs[wi]
            wi += 1
            return r[:]

        for _ in range(n_blocks):
            r_a, r_b, wr = take(), take(), take()
            h = jnp.dot(_bn_mish(x, r_a, r_b), wr,
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            for _ in range(inner):
                i_a, i_b = take(), take()
                w9 = take()  # [9*Cb, Cb] in OFFSETS order
                cb = w9.shape[1]
                t = _bn_mish(h, i_a, i_b)
                # roll(t, -s) @ W == roll(t @ W, -s), and the edge mask is a
                # per-row scalar so it commutes with the row-wise dot: doing
                # the dot FIRST keeps exactly one [M, Cb] live intermediate
                # per tap (the 9-rolled-inputs form blew the 16 MB scoped
                # VMEM limit: 50.5 MB at C=128).
                acc = jnp.zeros((M, cb), jnp.float32)
                for o, (di, dj) in enumerate(OFFSETS):
                    s = (di * BOARD + dj) * GROUP
                    v = jnp.dot(t, w9[o * cb:(o + 1) * cb],
                                preferred_element_type=jnp.float32)
                    if s != 0:
                        v = jnp.roll(v, -s, axis=0)
                    acc += masks[o].astype(jnp.float32) * v
                h = acc.astype(jnp.bfloat16)
            e_a, e_b, we = take(), take(), take()
            y = jnp.dot(_bn_mish(h, e_a, e_b), we,
                        preferred_element_type=jnp.float32)
            x = ((x.astype(jnp.float32) + y) * on).astype(jnp.bfloat16)
        out_ref[:] = x.reshape(1, PPOS, GROUP, channels)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_blocks", "inner", "channels",
                                             "interpret"))
def _segment_call(xi, n_blocks, inner, channels, interpret, *arrs):
    ng = xi.shape[0]
    kern = _make_segment_kernel(n_blocks, inner, channels)

    def w_spec(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, (lambda i, _nd=nd: (0,) * _nd),
                            memory_space=pltpu.VMEM)

    blk = pl.BlockSpec((1, PPOS, GROUP, channels), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(xi.shape, jnp.bfloat16),
        grid=(ng,),
        in_specs=[blk] + [w_spec(a) for a in arrs],
        out_specs=blk,
        interpret=interpret,
        # Mosaic's stack accounting keeps the unrolled taps' [M,Cb]
        # intermediates live (~40 MB for a 3-block segment at C=128) and
        # the default scoped-VMEM limit is 16 MB; v5e has 128 MB physical
        # VMEM, so raise the ceiling instead of shrinking the segment.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(xi, *arrs)


def _bc_block_xla(xi, arrs, f32_dots: bool):
    """Broadcast residual block on the interleaved layout [Ng,PPOS,G,C].

    arrs = (f_a, f_b, Wf, Wd_pad [PPOS,PPOS], bd_col [PPOS,1], l_a, l_b,
    Wl); Wd_pad[p, q] = Dense kernel[p, q] zero-padded, so pad rows
    neither receive nor contribute. `f32_dots`: XLA:CPU's DotThunk can't
    execute bf16 x bf16 -> f32 einsums (TPU MXU can), so interpret-mode
    runs cast operands up."""
    md = jnp.float32 if f32_dots else jnp.bfloat16
    f_a, f_b, wf, wd, bd, l_a, l_b, wl = arrs
    res = xi
    x32 = xi.astype(jnp.float32) * f_a[0] + f_b[0]
    h = jnp.einsum("gpbc,cd->gpbd", _mish_f32(x32).astype(md), wf.astype(md),
                   preferred_element_type=jnp.float32)
    m = _mish_f32(h).astype(md)
    z = jnp.einsum("gpbc,pq->gqbc", m, wd.astype(md),
                   preferred_element_type=jnp.float32)
    z = z + bd[:, 0][None, :, None, None]
    z32 = z * l_a[0] + l_b[0]
    y = jnp.einsum("gpbc,cd->gpbd", _mish_f32(z32).astype(md), wl.astype(md),
                   preferred_element_type=jnp.float32)
    return (res.astype(jnp.float32) + y).astype(jnp.bfloat16)


def build_trunk_weights_v2(config, variables):
    """Like trunk_kernel.build_trunk_weights but broadcast mixing weights
    are padded to PPOS=368 and kept UN-transposed ([p, q]: source row ->
    dest position) for the XLA einsum."""
    kinds, arrs = build_trunk_weights(config, variables)
    # v1 packs the bc mix as WdT [384,384] (transposed, PPAD=384) + bdp
    # [384,1]. Rebuild those two entries at PPOS with no transpose,
    # walking the flat array list with v1's consumption pattern.
    params = variables["params"]
    inner = config.inner_bottleneck_layers
    out_arrs: List[jnp.ndarray] = []
    ai = 0
    for b, kind in enumerate(kinds):
        if kind == "btl":
            n = 3 * (2 + inner)  # (a, b, W) per ConvBlock
            out_arrs.extend(arrs[ai:ai + n])
            ai += n
        else:
            out_arrs.extend(arrs[ai:ai + 3])  # conv_first a, b, W
            ai += 3
            name = f"broadcast_res_{b}"
            wd = params[name]["mix"]["Dense_0"]["kernel"]  # [361, 361]
            bd = params[name]["mix"]["Dense_0"]["bias"]  # [361]
            wdp = jnp.zeros((PPOS, PPOS), jnp.float32)
            wdp = wdp.at[:POS, :POS].set(wd)
            bdp = jnp.zeros((PPOS, 1), jnp.float32).at[:POS, 0].set(bd)
            out_arrs.append(wdp.astype(jnp.bfloat16))
            out_arrs.append(bdp)
            ai += 2  # skip v1's wdt/bdp
            out_arrs.extend(arrs[ai:ai + 3])  # conv_last a, b, W
            ai += 3
    assert ai == len(arrs)
    return kinds, out_arrs


def build_trunk_fn_v2(config, variables, interpret: bool = None):
    """-> trunk_fn(x [N,19,19,C] bf16) -> [N,19,19,C] bf16.

    Pass as P3achyGoModel.__call__(..., trunk_fn=...). `variables` may be
    traced (weights swap per generation without a rebuild)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    kinds, arrs = build_trunk_weights_v2(config, variables)
    plan = _plan_segments(kinds)
    channels = config.channels
    inner = config.inner_bottleneck_layers
    n_btl_arrs = 3 * (2 + inner)

    # Pre-slice the flat array list per plan entry.
    seg_arrs: List[List[jnp.ndarray]] = []
    ai = 0
    for kind, _start, n in plan:
        if kind == "btl":
            cnt = n * n_btl_arrs
        else:
            cnt = 8
        seg_arrs.append(arrs[ai:ai + cnt])
        ai += cnt
    assert ai == len(arrs)

    def trunk_fn(x):
        n = x.shape[0]
        ng = -(-n // GROUP)
        np_ = ng * GROUP
        xf = x.reshape(n, POS, channels).astype(jnp.bfloat16)
        xp = jnp.zeros((np_, PPOS, channels), jnp.bfloat16)
        xp = xp.at[:n, :POS, :].set(xf)
        # interleave: [Ng, G, PPOS, C] -> [Ng, PPOS, G, C]
        xi = xp.reshape(ng, GROUP, PPOS, channels).transpose(0, 2, 1, 3)
        for (kind, _start, nblk), sa in zip(plan, seg_arrs):
            if kind == "btl":
                xi = _segment_call(xi, nblk, inner, channels, interpret, *sa)
            else:
                xi = _bc_block_xla(xi, sa, f32_dots=interpret)
        xo = xi.transpose(0, 2, 1, 3).reshape(np_, PPOS, channels)
        return xo[:n, :POS, :].reshape(n, BOARD, BOARD, channels)

    return trunk_fn
