"""Orbax checkpointing (replaces model_%04d.keras + live_model.keras files,
rl_loop/fs_utils.py:25-65 / gcs_utils.py:20-26 discovery semantics)."""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import orbax.checkpoint as ocp

MODEL_FMT = "model_%04d"
LIVE_NAME = "live"


def _ckpt(path: str):
    return ocp.StandardCheckpointer()


def save_named(root: str, name: str, tree: Any) -> str:
    """Save `tree` under root/name (overwrites)."""
    root = os.path.abspath(root)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, name)
    ckptr = _ckpt(path)
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def save_checkpoint(root: str, gen: int, tree: Any, live: bool = True) -> str:
    """Save `tree` as model_%04d (and update `live`)."""
    path = save_named(root, MODEL_FMT % gen, tree)
    if live:
        save_named(root, LIVE_NAME, tree)
    return path


def restore_checkpoint(path: str, template: Any) -> Any:
    ckptr = _ckpt(path)
    return ckptr.restore(os.path.abspath(path), template)


def latest_generation(root: str) -> Optional[int]:
    """Most recent model_%04d in `root` (get_most_recent_model parity)."""
    if not os.path.isdir(root):
        return None
    gens = []
    for name in os.listdir(root):
        m = re.fullmatch(r"model_(\d{4})", name)
        if m:
            gens.append(int(m.group(1)))
    return max(gens) if gens else None
