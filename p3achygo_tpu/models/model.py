"""P3achyGo model (flax.linen): trunk + policy/value heads.

Mirrors python/model.py P3achyGoModel (model.py:1063-1295): 15-plane board
input + 8 scalar game-state input, init conv (conv_size+2) + game-state
bias broadcast, trunk of classic/btl/nbt blocks with broadcast blocks every
`broadcast_interval`, KataGo-style policy and value heads. All outputs are
cast to fp32 (model.py:1264-1289); trunk compute dtype is configurable
(bf16 on TPU).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from p3achygo_tpu.constants import (
    BOARD_LEN,
    NUM_INPUT_FEATURES,
    NUM_INPUT_PLANES,
)
from p3achygo_tpu.models.blocks import (
    BottleneckResidualBlock,
    BroadcastResidualBlock,
    ClassicResidualBlock,
    NbtResidualBlock,
)
from p3achygo_tpu.models.config import ModelConfig
from p3achygo_tpu.models.heads import PolicyHead, ValueHead
from p3achygo_tpu.models.transformer import PositionalEmbedding, TransformerBlock

Dtype = Any


class ModelOutputs(NamedTuple):
    """All model outputs, fp32 (mirrors model.py docstring outputs 0-24)."""

    pi_logits: jnp.ndarray  # [N, 362]
    pi_probs: jnp.ndarray
    outcome_logits: jnp.ndarray  # [N, 2]
    outcome_probs: jnp.ndarray
    ownership: jnp.ndarray  # [N, 361]
    score_logits: jnp.ndarray  # [N, 800]
    score_probs: jnp.ndarray
    gamma: jnp.ndarray  # [N, 1]
    pi_logits_aux: jnp.ndarray  # [N, 362]
    q6: jnp.ndarray  # [N]
    q16: jnp.ndarray
    q50: jnp.ndarray
    q6_err: jnp.ndarray
    q16_err: jnp.ndarray
    q50_err: jnp.ndarray
    q6_score: jnp.ndarray
    q16_score: jnp.ndarray
    q50_score: jnp.ndarray
    q6_score_err: jnp.ndarray
    q16_score_err: jnp.ndarray
    q50_score_err: jnp.ndarray
    pi_logits_soft: jnp.ndarray  # [N, 362]
    pi_logits_optimistic: jnp.ndarray  # [N, 362]
    mcts_dist_logits: jnp.ndarray  # [N, 51]
    mcts_dist_probs: jnp.ndarray


class P3achyGoModel(nn.Module):
    config: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, board_state, game_state, train: bool = False,
                 scores=None, trunk_fn=None) -> ModelOutputs:
        # `trunk_fn` swaps the residual trunk for the fused Pallas serving
        # kernel (p3achygo_tpu/nn/trunk_kernel.py — the TRT-engine
        # counterpart): stem + heads stay flax so the param tree and the
        # training graph are unchanged. Inference-only (no gradients).
        cfg = self.config
        board_state = board_state.astype(self.dtype)
        game_state = game_state.astype(self.dtype)

        x = nn.Conv(cfg.channels, (cfg.conv_size + 2, cfg.conv_size + 2),
                    use_bias=False, padding="SAME", dtype=self.dtype,
                    name="init_board_conv")(board_state)
        game_biases = nn.Dense(cfg.channels, dtype=self.dtype,
                               name="init_game_layer")(game_state)
        x = x + game_biases[:, None, None, :]

        if trunk_fn is not None:
            x = trunk_fn(x).astype(self.dtype)
        elif cfg.is_transformer:
            x = nn.Dense(cfg.embed_dim, dtype=self.dtype, name="embed")(x)
            x = PositionalEmbedding(self.dtype, name="pos_embed")(x)
            for i in range(cfg.blocks):
                x = TransformerBlock(cfg.embed_dim, cfg.num_heads,
                                     dtype=self.dtype,
                                     name=f"transformer_{i}")(x, train)
        else:
            for i in range(cfg.blocks):
                if i % cfg.broadcast_interval == cfg.broadcast_interval - 1:
                    x = BroadcastResidualBlock(
                        cfg.channels, self.dtype,
                        name=f"broadcast_res_{i}")(x, train)
                elif cfg.trunk_block_type == "btl":
                    x = BottleneckResidualBlock(
                        cfg.channels, cfg.bottleneck_channels, cfg.conv_size,
                        stack_size=cfg.bottleneck_length, dtype=self.dtype,
                        name=f"bottleneck_res_{i}")(x, train)
                elif cfg.trunk_block_type == "classic":
                    x = ClassicResidualBlock(
                        cfg.channels, cfg.conv_size, dtype=self.dtype,
                        name=f"classic_res_{i}")(x, train)
                elif cfg.trunk_block_type == "nbt":
                    x = NbtResidualBlock(
                        cfg.channels, cfg.bottleneck_channels, cfg.conv_size,
                        dtype=self.dtype, name=f"nbt_res_{i}")(x, train)
                else:
                    raise ValueError(cfg.trunk_block_type)

        pi, pi_aux, pi_soft, pi_opt = PolicyHead(
            cfg.head_channels, self.dtype, name="policy_head")(x, train)
        vh = ValueHead(cfg.head_channels, cfg.c_val, self.dtype,
                       name="value_head")(x, scores)

        f32 = lambda t: t.astype(jnp.float32)
        pi, pi_aux, pi_soft, pi_opt = f32(pi), f32(pi_aux), f32(pi_soft), f32(pi_opt)
        return ModelOutputs(
            pi_logits=pi,
            pi_probs=jax.nn.softmax(pi, axis=-1),
            outcome_logits=vh["outcome_logits"],
            outcome_probs=jax.nn.softmax(vh["outcome_logits"], axis=-1),
            ownership=vh["ownership"],
            score_logits=vh["score_logits"],
            score_probs=jax.nn.softmax(vh["score_logits"], axis=-1),
            gamma=vh["gamma"],
            pi_logits_aux=pi_aux,
            q6=vh["q6"], q16=vh["q16"], q50=vh["q50"],
            q6_err=vh["q6_err"], q16_err=vh["q16_err"], q50_err=vh["q50_err"],
            q6_score=vh["q6_score"], q16_score=vh["q16_score"],
            q50_score=vh["q50_score"],
            q6_score_err=vh["q6_score_err"], q16_score_err=vh["q16_score_err"],
            q50_score_err=vh["q50_score_err"],
            pi_logits_soft=pi_soft,
            pi_logits_optimistic=pi_opt,
            mcts_dist_logits=vh["mcts_dist_logits"],
            mcts_dist_probs=jax.nn.softmax(vh["mcts_dist_logits"], axis=-1),
        )


def build_model(config: ModelConfig, dtype=jnp.float32) -> P3achyGoModel:
    return P3achyGoModel(config=config, dtype=dtype)


def init_params(model: P3achyGoModel, rng: jax.Array, batch_size: int = 1):
    """Initialize params + batch stats with dummy inputs."""
    board = jnp.zeros((batch_size, BOARD_LEN, BOARD_LEN, NUM_INPUT_PLANES),
                      jnp.float32)
    scalars = jnp.zeros((batch_size, NUM_INPUT_FEATURES), jnp.float32)
    variables = model.init(rng, board, scalars, train=False)
    return variables
