"""Area scoring + ownership with Benson pass-alive analysis, vectorized.

Mirrors cc/game/board.cc: Benson's algorithm (board.cc:246-463) and
ScoreAndOwnership (board.cc:916-988), re-expressed as bounded fixed-point
lattice programs:

- Connected components via min-label propagation under lax.while_loop.
- Region/chain vitality as a [362, 362] (region-rep x chain-rep) count
  matrix built with deduplicated scatter-adds.
- Benson's chain-removal loop as a boolean fixed point over rep arrays,
  with region death propagated by one matvec per iteration.

These run at scoring time (and optionally after repeated passes), not in the
per-move hot path, so the worst-case propagation depth is acceptable.
All functions are single-board; vmap for batches.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from p3achygo_tpu.constants import BLACK, EMPTY, NUM_LOCS, WHITE
from p3achygo_tpu.game.board import NEIGHBORS, GoState, _pad

_IOTA = jnp.arange(NUM_LOCS, dtype=jnp.int32)
_SENT = NUM_LOCS


def label_components(mask: jnp.ndarray) -> jnp.ndarray:
    """Min-index connected-component labels of `mask` -> int32[361], -1 off."""
    lbl0 = jnp.where(mask, _IOTA, jnp.int32(_SENT))
    mask_p = _pad(mask, jnp.bool_(False))

    def body(carry):
        lbl, _ = carry
        nl = _pad(lbl, jnp.int32(_SENT))[NEIGHBORS]  # [361, 4]
        nl = jnp.where(mask_p[NEIGHBORS], nl, _SENT)
        cand = jnp.minimum(lbl, jnp.min(nl, axis=1))
        new = jnp.where(mask, cand, jnp.int32(_SENT))
        return new, jnp.any(new != lbl)

    def cond(carry):
        return carry[1]

    lbl, _ = jax.lax.while_loop(cond, body, (lbl0, jnp.bool_(True)))
    return jnp.where(mask, lbl, jnp.int32(-1))


def _dedup_dir_masks(ids: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """For [361, 4] neighbor ids, mask each direction that is valid and not a
    duplicate of an earlier direction at the same point."""
    c0, c1, c2, c3 = ids[:, 0], ids[:, 1], ids[:, 2], ids[:, 3]
    m0 = valid[:, 0]
    m1 = valid[:, 1] & (c1 != c0)
    m2 = valid[:, 2] & (c2 != c0) & (c2 != c1)
    m3 = valid[:, 3] & (c3 != c0) & (c3 != c1) & (c3 != c2)
    return jnp.stack([m0, m1, m2, m3], axis=1)  # [361, 4]


def pass_alive_for_color(stones: jnp.ndarray, chain_id: jnp.ndarray,
                         color: jnp.ndarray) -> jnp.ndarray:
    """Benson pass-alive mask for `color` -> bool[361].

    True on stones of pass-alive `color` chains and on all points of their
    surviving enclosed regions (board.cc:249-276).
    """
    color = jnp.asarray(color, jnp.int8)
    is_color = stones == color
    empty = stones == EMPTY
    nonc = ~is_color  # empty or opponent: candidate region points

    region = label_components(nonc)  # [361], -1 on color stones

    nbr_color = _pad(stones, jnp.int8(99))[NEIGHBORS]  # [361, 4]
    nbr_chain = _pad(chain_id, jnp.int32(-1))[NEIGHBORS]
    nbr_is_color = nbr_color == color

    # Region enumeration starts from empty points (board.cc:303-316): a pure
    # opponent-stone component is not a region.
    has_empty = jnp.zeros((_SENT + 1,), jnp.bool_).at[
        jnp.where(empty, region, _SENT)].max(True)

    # Small: every empty point of the region borders a `color` chain.
    adj_color = jnp.any(nbr_is_color, axis=1)
    bad_empty = empty & ~adj_color
    region_has_bad = jnp.zeros((_SENT + 1,), jnp.bool_).at[
        jnp.where(bad_empty, region, _SENT)].max(True)
    small = has_empty & ~region_has_bad
    small = small.at[_SENT].set(False)

    # Vital count matrix V[r, g] = #empty points of region r adjacent to
    # chain g (dedup among the <=4 neighbor chains per point).
    gids = jnp.where(nbr_is_color, nbr_chain, _SENT)  # [361, 4]
    dmask = _dedup_dir_masks(gids, nbr_is_color) & empty[:, None]
    r_idx = jnp.broadcast_to(jnp.where(empty, region, _SENT)[:, None], (NUM_LOCS, 4))
    g_idx = jnp.where(dmask, gids, _SENT)
    V = jnp.zeros((_SENT + 1, _SENT + 1), jnp.int32)
    V = V.at[r_idx.reshape(-1), g_idx.reshape(-1)].add(
        dmask.reshape(-1).astype(jnp.int32))
    n_empty = jnp.zeros((_SENT + 1,), jnp.int32).at[
        jnp.where(empty, region, _SENT)].add(1)

    vital = small[:, None] & (V == n_empty[:, None]) & (n_empty[:, None] > 0)

    # Region-chain adjacency A[r, g]: any region point adjacent to chain g.
    amask = _dedup_dir_masks(gids, nbr_is_color) & nonc[:, None]
    ar_idx = jnp.broadcast_to(jnp.where(nonc, region, _SENT)[:, None], (NUM_LOCS, 4))
    ag_idx = jnp.where(amask, gids, _SENT)
    A = jnp.zeros((_SENT + 1, _SENT + 1), jnp.bool_)
    A = A.at[ar_idx.reshape(-1), ag_idx.reshape(-1)].max(amask.reshape(-1))

    is_group = jnp.zeros((_SENT + 1,), jnp.bool_).at[
        jnp.where(is_color, chain_id, _SENT)].max(True)
    is_group = is_group.at[_SENT].set(False)

    def body(carry):
        alive_g, alive_r, _ = carry
        vital_count = jnp.sum(
            jnp.where(alive_r[:, None] & vital, 1, 0), axis=0)
        new_alive_g = alive_g & (vital_count >= 2)
        removed = alive_g & ~new_alive_g
        dead_r = jnp.any(A & removed[None, :], axis=1)
        new_alive_r = alive_r & ~dead_r
        changed = jnp.any(new_alive_g != alive_g) | jnp.any(new_alive_r != alive_r)
        return new_alive_g, new_alive_r, changed

    def cond(carry):
        return carry[2]

    alive_g, alive_r, _ = jax.lax.while_loop(
        cond, body, (is_group, small, jnp.bool_(True)))

    pa_stones = is_color & alive_g[jnp.clip(chain_id, 0, _SENT)]
    pa_region = nonc & alive_r[jnp.clip(region, 0, _SENT)] & (region >= 0)
    return pa_stones | pa_region


def compute_pass_alive(state: GoState) -> jnp.ndarray:
    """Combined pass-alive ownership -> int8[361] in {0, BLACK, WHITE}."""
    pa_b = pass_alive_for_color(state.stones, state.chain_id, jnp.int8(BLACK))
    pa_w = pass_alive_for_color(state.stones, state.chain_id, jnp.int8(WHITE))
    return (pa_b.astype(jnp.int8) * BLACK + pa_w.astype(jnp.int8) * WHITE)


# Move counts at which self-play recomputes pass-alive regions
# (kComputePAMoveNums, self_play_thread.cc:56).
PA_CHECKPOINT_FIRST = 200
PA_CHECKPOINT_LAST = 400
PA_CHECKPOINT_STRIDE = 50
# Total passes after which the reference recomputes on every pass
# (kNumPassesBeforeBensons, constants.h:75).
PA_PASSES_THRESHOLD = 3


def pass_alive_refresh_needed(states: GoState) -> jnp.ndarray:
    """bool[B]: board crossed a PA checkpoint (or is in the >= 3-passes
    endgame regime) since its last refresh.

    The reference recomputes exactly at moves {200,250,...,400}
    (self_play_thread.cc:701-705) and after every pass once passes >= 3
    (board.cc:587-590). Here the caller polls on a host cadence, so a
    board refreshes at the first poll after crossing a boundary
    (documented deviation: bounded lag instead of exact move numbers).
    """
    mc = states.move_count
    ck = jnp.clip(mc, 0, PA_CHECKPOINT_LAST) // PA_CHECKPOINT_STRIDE
    ck_prev = jnp.clip(states.pa_move, 0,
                       PA_CHECKPOINT_LAST) // PA_CHECKPOINT_STRIDE
    crossed = (mc >= PA_CHECKPOINT_FIRST) & (ck > ck_prev)
    endgame = (states.passes >= PA_PASSES_THRESHOLD) \
        & (mc > states.pa_move)
    return crossed | endgame


def refresh_pass_alive(states: GoState,
                       need: Optional[jnp.ndarray] = None) -> GoState:
    """Recompute the batched pass-alive maps for boards in `need`
    (default: pass_alive_refresh_needed). Cheap no-op graph branch when no
    board needs it (lax.cond on the batch-level predicate)."""
    if need is None:
        need = pass_alive_refresh_needed(states)

    def do(operand):
        states, need = operand
        pa = jax.vmap(compute_pass_alive)(states)
        return states._replace(
            pass_alive=jnp.where(need[:, None], pa, states.pass_alive),
            pa_move=jnp.where(need, states.move_count, states.pa_move))

    return jax.lax.cond(jnp.any(need), do, lambda op: op[0], (states, need))


def _score_one_color(stones, pass_alive, color, komi):
    """Score + ownership for one color (board.cc:916-988)."""
    color = jnp.asarray(color, jnp.int8)
    empty = stones == EMPTY
    is_color = stones == color
    is_opp = stones == (-color)
    dead_opp = is_opp & (pass_alive == color)
    live_opp = is_opp & ~dead_opp
    # Live own stones: not sitting inside the opponent's pass-alive area.
    live_self = is_color & ~(pass_alive == (-color))

    regmask = empty | dead_opp
    reg = label_components(regmask)
    reg_safe = jnp.where(regmask, reg, _SENT)

    nbr_stone = _pad(stones, jnp.int8(99))[NEIGHBORS]
    nbr_live_opp = _pad(live_opp, jnp.bool_(False))[NEIGHBORS]
    touches_self = jnp.any(nbr_stone == color, axis=1)
    touches_live_opp = jnp.any(nbr_live_opp, axis=1)

    t_self = jnp.zeros((_SENT + 1,), jnp.bool_).at[
        jnp.where(regmask, reg_safe, _SENT)].max(touches_self & regmask)
    t_opp = jnp.zeros((_SENT + 1,), jnp.bool_).at[
        jnp.where(regmask, reg_safe, _SENT)].max(touches_live_opp & regmask)
    counted = t_self & ~t_opp
    counted = counted.at[_SENT].set(False)

    region_owned = regmask & counted[reg_safe]
    ownership = live_self | region_owned
    score = jnp.sum(ownership.astype(jnp.int32)).astype(jnp.float32)
    score = score + jnp.where(color == WHITE, komi, 0.0)
    return score, ownership


def score(state: GoState):
    """Final scores + ownership.

    Returns (black_score, white_score, ownership int8[361]) matching
    Board::GetScores (board.cc:645-672): black's claim wins ties in the
    merged ownership map.
    """
    pa = compute_pass_alive(state)
    b_score, b_own = _score_one_color(state.stones, pa, jnp.int8(BLACK), state.komi)
    w_score, w_own = _score_one_color(state.stones, pa, jnp.int8(WHITE), state.komi)
    ownership = jnp.where(b_own, jnp.int8(BLACK),
                          jnp.where(w_own, jnp.int8(WHITE), jnp.int8(EMPTY)))
    return b_score, w_score, ownership
