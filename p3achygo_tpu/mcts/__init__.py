"""Batched MCTS: Gumbel sequential halving + PUCT over array trees."""
from p3achygo_tpu.mcts.gumbel import (  # noqa: F401
    EvalOutput,
    GumbelResult,
    SearchParams,
    make_eval_fn,
    search_root,
    uniform_eval_fn,
)
from p3achygo_tpu.mcts.tree import Tree, make_tree  # noqa: F401
