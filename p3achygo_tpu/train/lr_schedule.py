"""LR schedules (mirrors python/lr_schedule.py:7-118) as jax-friendly fns."""
from __future__ import annotations

import jax.numpy as jnp


def constant_lr(lr: float):
    return lambda step: jnp.float32(lr)


def cyclic_lr(min_lr: float, max_lr: float, cycle_len: int):
    """Triangular cyclic LR (arXiv 1803.09820)."""
    half = cycle_len // 2 if cycle_len % 2 == 0 else cycle_len // 2 + 1
    delta = (max_lr - min_lr) / half

    def fn(step):
        s = step % cycle_len
        ninc = jnp.minimum(s, half)
        ndec = jnp.maximum(0, s - half)
        return min_lr + delta * (ninc - ndec).astype(jnp.float32)

    return fn


def cyclic_lr_decay(min_lr: float, max_lr: float, cycle_len: int,
                    decay_bound: float = 0.95):
    """One-cycle with final decay to 0.25 * min_lr."""
    main_len = int(cycle_len * decay_bound)
    half = cycle_len // 2 if cycle_len % 2 == 0 else cycle_len // 2 + 1
    decay_len = max(cycle_len - main_len, 1)
    delta = (max_lr - min_lr) / half
    lr_final = min_lr * 0.25
    decay_delta = (min_lr - lr_final) / decay_len

    def fn(step):
        cycle_step = jnp.where(step < main_len, step % main_len, 0)
        decay_step = jnp.where(step >= main_len, step - main_len, 0)
        ninc = jnp.minimum(cycle_step, half)
        ndec = jnp.maximum(0, cycle_step - half)
        return (min_lr + delta * (ninc - ndec).astype(jnp.float32)
                - decay_delta * decay_step.astype(jnp.float32))

    return fn


def lr_for_gen(config, model_gen: int) -> float:
    """Per-generation LR (rl_loop/train.py:33-49 get_lr): 0.1 -> 1.0 scale
    over `lr_growth_window` generations, base LR from the piecewise
    `lr_schedule` [(gen, lr), ...] with a half-cosine transition toward the
    next scheduled LR over the last `lr_transition_window` generations."""
    import math

    if getattr(config, "lr_growth_window", 0) > 0:
        lr_scale = 0.1 + 0.9 * min(1.0, model_gen / config.lr_growth_window)
    else:
        lr_scale = 1.0

    lr = config.lr
    next_gen, next_lr = None, None
    for gen, gen_lr in (config.lr_schedule or []):
        if gen > model_gen:
            next_gen, next_lr = gen, gen_lr
            break
        lr = gen_lr

    window = getattr(config, "lr_transition_window", 0)
    if window > 0 and next_gen is not None and (next_gen - model_gen) <= window:
        t = 0.5 * (1.0 - math.cos(
            math.pi * (1.0 - (next_gen - model_gen) / window)))
        lr = lr + t * (next_lr - lr)
    return lr_scale * lr


def gen_growth_scale(gen: int, growth_gens: int = 10,
                     transition_gens: int = 10) -> float:
    """Per-generation LR warm-up: 0.1 -> 1.0 over `growth_gens`, cosine
    transition over the next `transition_gens` (rl_loop/train.py:33-49)."""
    import math

    if gen < growth_gens:
        return 0.1 + 0.9 * gen / growth_gens
    if gen < growth_gens + transition_gens:
        t = (gen - growth_gens) / transition_gens
        return 1.0
    return 1.0
