"""Model + loss tests (vs model.py heads/losses semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p3achygo_tpu.constants import (
    NUM_INPUT_FEATURES,
    NUM_INPUT_PLANES,
    NUM_MOVES,
    NUM_SCORE_LOGITS,
    NUM_V_BUCKETS,
)
from p3achygo_tpu.models import (
    GroundTruth,
    LossCoeffs,
    build_model,
    compute_losses,
    get_config,
    init_params,
)


def _dummy_inputs(rng, n):
    k1, k2 = jax.random.split(rng)
    board = jax.random.uniform(k1, (n, 19, 19, NUM_INPUT_PLANES))
    scalars = jax.random.uniform(k2, (n, NUM_INPUT_FEATURES))
    return board, scalars


def _dummy_targets(rng, n):
    ks = jax.random.split(rng, 6)
    pol = jax.nn.softmax(jax.random.normal(ks[0], (n, NUM_MOVES)))
    score_idx = jax.random.randint(ks[1], (n,), 0, NUM_SCORE_LOGITS)
    return GroundTruth(
        policy=pol,
        policy_aux=jax.random.randint(ks[2], (n,), 0, NUM_MOVES),
        score=jnp.zeros((n,)),
        score_one_hot=jax.nn.one_hot(score_idx, NUM_SCORE_LOGITS),
        game_outcome=jax.nn.one_hot(jax.random.randint(ks[3], (n,), 0, 2), 2),
        own=jax.random.uniform(ks[4], (n, 361), minval=-1, maxval=1),
        q6=jnp.zeros((n,)), q16=jnp.zeros((n,)), q50=jnp.zeros((n,)),
        q6_score=jnp.zeros((n,)), q16_score=jnp.zeros((n,)),
        q50_score=jnp.zeros((n,)),
        policy_aux_dist=pol,
        has_pi_aux_dist=jnp.ones((n,), bool),
        mcts_value_dist=jnp.ones((n, NUM_V_BUCKETS)),
        has_mcts_value_dist=jnp.ones((n,), bool),
    )


@pytest.mark.parametrize("name", ["tiny", "b8c64"])
def test_forward_shapes(name):
    model = build_model(get_config(name))
    variables = init_params(model, jax.random.PRNGKey(0))
    board, scalars = _dummy_inputs(jax.random.PRNGKey(1), 2)
    out = model.apply(variables, board, scalars, train=False)
    assert out.pi_logits.shape == (2, NUM_MOVES)
    assert out.pi_probs.shape == (2, NUM_MOVES)
    assert out.outcome_logits.shape == (2, 2)
    assert out.ownership.shape == (2, 361)
    assert out.score_logits.shape == (2, NUM_SCORE_LOGITS)
    assert out.gamma.shape == (2, 1)
    assert out.q6.shape == (2,)
    assert out.mcts_dist_logits.shape == (2, NUM_V_BUCKETS)
    # all outputs fp32 and finite
    for t in out:
        assert t.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(t)))
    # probs sum to 1
    np.testing.assert_allclose(np.asarray(out.pi_probs.sum(-1)), 1.0, atol=1e-5)
    # q err bounded [0, 4]
    assert bool(jnp.all((out.q6_err >= 0) & (out.q6_err <= 4)))


def test_transformer_forward():
    model = build_model(get_config("b14d96h3_transformer"))
    # shrink for test speed
    cfg = get_config("b14d96h3_transformer")
    import dataclasses
    cfg = dataclasses.replace(cfg, blocks=2)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    board, scalars = _dummy_inputs(jax.random.PRNGKey(1), 2)
    out = model.apply(variables, board, scalars, train=False)
    assert out.pi_logits.shape == (2, NUM_MOVES)


def test_bf16_compute():
    model = build_model(get_config("tiny"), dtype=jnp.bfloat16)
    variables = init_params(model, jax.random.PRNGKey(0))
    board, scalars = _dummy_inputs(jax.random.PRNGKey(1), 2)
    out = model.apply(variables, board, scalars, train=False)
    assert out.pi_logits.dtype == jnp.float32  # heads cast back
    assert bool(jnp.all(jnp.isfinite(out.pi_logits)))


def test_batchnorm_updates():
    model = build_model(get_config("tiny"))
    variables = init_params(model, jax.random.PRNGKey(0))
    board, scalars = _dummy_inputs(jax.random.PRNGKey(1), 4)
    out, mutated = model.apply(variables, board, scalars, train=True,
                               mutable=["batch_stats"])
    assert "batch_stats" in mutated


def test_losses_finite_and_decrease_on_perfect_targets():
    model = build_model(get_config("tiny"))
    variables = init_params(model, jax.random.PRNGKey(0))
    board, scalars = _dummy_inputs(jax.random.PRNGKey(1), 4)
    out = model.apply(variables, board, scalars, train=False)
    targets = _dummy_targets(jax.random.PRNGKey(2), 4)
    losses = compute_losses(out, targets, LossCoeffs.rl())
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss"]) > 0

    # Self-consistent targets -> policy loss ~ 0.
    perfect = targets._replace(policy=out.pi_probs)
    losses2 = compute_losses(out, perfect, LossCoeffs.rl())
    assert float(losses2["policy"]) < 1e-3


def test_loss_gradients_flow():
    model = build_model(get_config("tiny"))
    variables = init_params(model, jax.random.PRNGKey(0))
    board, scalars = _dummy_inputs(jax.random.PRNGKey(1), 2)
    targets = _dummy_targets(jax.random.PRNGKey(2), 2)

    def loss_fn(params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          board, scalars, train=False)
        return compute_losses(out, targets, LossCoeffs.rl())["loss"]

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    total_norm = sum(float(jnp.sum(l * l)) for l in leaves) ** 0.5
    assert total_norm > 0


def test_validation_metrics():
    from p3achygo_tpu.train.val import validate

    model = build_model(get_config("tiny"))
    variables = init_params(model, jax.random.PRNGKey(0))
    board, scalars = _dummy_inputs(jax.random.PRNGKey(1), 4)
    targets = _dummy_targets(jax.random.PRNGKey(2), 4)
    out = validate(model, variables, [(board, scalars, targets)],
                   LossCoeffs.rl())
    for key in ("loss", "policy_acc", "policy_acc_top5", "outcome_acc",
                "score_mae", "own_mae"):
        assert key in out and np.isfinite(out[key])
    assert 0.0 <= out["policy_acc"] <= out["policy_acc_top5"] <= 1.0


def test_mish_matches_reference_formula():
    """The 1-exp mish must equal x*tanh(softplus(x)) to float precision
    across the numeric range (incl. large |x| where naive exp overflows)."""
    import jax.numpy as jnp
    import numpy as np
    from p3achygo_tpu.models.blocks import mish

    x = jnp.asarray(np.concatenate([
        np.linspace(-80, 80, 4001),
        np.array([-1e4, -100.0, -0.0, 0.0, 100.0, 1e4])]), jnp.float32)
    ref = x * jnp.tanh(jnp.logaddexp(x, 0.0))
    got = mish(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)
    assert np.all(np.isfinite(np.asarray(got)))
