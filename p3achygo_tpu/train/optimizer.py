"""Optimizers: ConvMuon (Muon w/ conv flattening, python/optimizer.py:7-147)
and SGD+Nesterov+clipnorm (rl_loop/train.py:115-119 alternative).

ConvMuon semantics mirrored from the reference:
- Conv kernels [H, W, in, out] are flattened to [H*W*in, out] for the
  Newton-Schulz orthogonalization; variables whose effective 2D dims are
  both > 4 take the Muon path, everything else falls back to AdamW.
- Moonlight RMS scaling: update *= rms_rate * sqrt(max(flat_dim, out_dim)).
- Decoupled weight decay scaled by the same RMS factor
  (scale_weight_decay_by_rms) and by (lr / wd_lr_max)^wd_lr_exponent
  (KataGo-style sublinear WD, exponent 0.70).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def _newton_schulz5(G: jnp.ndarray, steps: int = 5,
                    eps: float = 1e-7) -> jnp.ndarray:
    """Quintic Newton-Schulz orthogonalization of a 2D matrix."""
    a, b, c = 3.4445, -4.7750, 2.0315
    transpose = G.shape[0] > G.shape[1]
    X = G.T if transpose else G
    X = X / (jnp.linalg.norm(X) + eps)

    def body(X, _):
        A = X @ X.T
        B = b * A + c * (A @ A)
        return a * X + B @ X, None

    X, _ = jax.lax.scan(body, X, None, length=steps)
    return X.T if transpose else X


def _is_muon_leaf(p: jnp.ndarray) -> bool:
    if p.ndim < 2:
        return False
    out_dim = p.shape[-1]
    flat_dim = 1
    for d in p.shape[:-1]:
        flat_dim *= d
    return out_dim > 4 and flat_dim > 4


class ConvMuonState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates  # Muon momentum (muon leaves) / Adam m (others)
    nu: optax.Updates  # Adam v (adamw leaves; zeros for muon leaves)


def conv_muon(
    learning_rate: Callable[[jnp.ndarray], jnp.ndarray] | float,
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 5,
    rms_rate: float = 0.2,
    weight_decay: float = 1e-4,
    wd_lr_exponent: Optional[float] = 0.70,
    wd_lr_max: Optional[float] = None,
    adam_b1: float = 0.9,
    adam_b2: float = 0.999,
    adam_eps: float = 1e-8,
    adam_weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    lr_fn = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def init(params):
        return ConvMuonState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        assert params is not None
        count = state.count + 1
        lr = lr_fn(count)
        if wd_lr_exponent is not None and wd_lr_max is not None:
            wd_lr_scale = jnp.minimum(lr / wd_lr_max, 1.0) ** wd_lr_exponent
        else:
            wd_lr_scale = 1.0
        bc1 = 1.0 - adam_b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - adam_b2 ** count.astype(jnp.float32)

        def leaf_update(g, m, v, p):
            if _is_muon_leaf(p):
                m_new = momentum * m + g
                g_eff = g + momentum * m_new if nesterov else m_new
                g2d = g_eff.reshape(-1, g_eff.shape[-1])
                ortho = _newton_schulz5(g2d, ns_steps).reshape(g_eff.shape)
                flat_dim = g2d.shape[0]
                out_dim = g2d.shape[1]
                scale = rms_rate * (max(flat_dim, out_dim) ** 0.5)
                upd = -lr * scale * ortho \
                    - lr * weight_decay * scale * wd_lr_scale * p
                return upd, m_new, v
            # AdamW fallback
            m_new = adam_b1 * m + (1 - adam_b1) * g
            v_new = adam_b2 * v + (1 - adam_b2) * (g * g)
            m_hat = m_new / bc1
            v_hat = v_new / bc2
            upd = -lr * (m_hat / (jnp.sqrt(v_hat) + adam_eps)
                         + adam_weight_decay * p)
            return upd, m_new, v_new

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        flat_p = treedef.flatten_up_to(params)
        out = [leaf_update(g, m, v, p)
               for g, m, v, p in zip(flat_g, flat_m, flat_v, flat_p)]
        updates = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return updates, ConvMuonState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def sgd_nesterov(learning_rate, momentum: float = 0.9,
                 clipnorm: float = 1.0) -> optax.GradientTransformation:
    """SGD + Nesterov momentum + global-norm clipping."""
    return optax.chain(
        optax.clip_by_global_norm(clipnorm),
        optax.sgd(learning_rate, momentum=momentum, nesterov=True),
    )
