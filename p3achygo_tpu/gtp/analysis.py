"""Analysis snapshots (mirrors cc/analysis/analysis.{h,cc}:11-33).

Builds lz-analyze-style info rows from a search result: per candidate move
its visits, winrate (Q mapped from [-1, 1] to [0, 10000]), prior (per
10000) and order. PV is depth-1 for now (the array tree is not returned
from the jitted search); deeper PV extraction lands with tree reuse.
"""
from __future__ import annotations

from typing import List

import numpy as np

from p3achygo_tpu.gtp.service import action_to_gtp_vertex


def analysis_rows(result, board_idx: int = 0, max_moves: int = 10
                  ) -> List[dict]:
    visits = np.asarray(result.root_child_visits[board_idx])
    q = np.asarray(result.root_child_q[board_idx])
    prior = np.asarray(result.root_priors[board_idx])
    order = np.argsort(-visits, kind="stable")
    rows = []
    for rank, mv in enumerate(order[:max_moves]):
        if visits[mv] == 0 and rank > 0:
            break
        winrate = (float(q[mv]) + 1.0) / 2.0
        rows.append(dict(
            move=action_to_gtp_vertex(int(mv)),
            visits=int(visits[mv]),
            winrate=int(round(max(min(winrate, 1.0), 0.0) * 10000)),
            prior=int(round(float(prior[mv]) * 10000)),
            order=rank,
            pv=action_to_gtp_vertex(int(mv)),
        ))
    return rows


def format_lz_analyze(rows: List[dict]) -> str:
    """One lz-analyze info line."""
    parts = []
    for r in rows:
        parts.append(
            f"info move {r['move']} visits {r['visits']} "
            f"winrate {r['winrate']} prior {r['prior']} order {r['order']} "
            f"pv {r['pv']}")
    return " ".join(parts)
