"""Smoke + behavior tests for the full in-tree EdgeSelector family and the
root noise types (reference: EdgeSelector.cpp create registry :680-712 and
applyDirichlet/Gumbel/CustomNoise :602-625)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import GameRules, CROSS, CIRCLE
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.search import mcts, tree_policy
from alphagomoku_tpu.models import create_network

H = W = 9
B = 2


@pytest.fixture(scope="module")
def setup():
    tables = V.device_tables(GameRules.FREESTYLE)
    net = create_network("FastPolicy", blocks=1, filters=8)
    x = jnp.zeros((1, H, W, net.cfg.input_planes), jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    apply = lambda v, p: net.apply(v, p, train=False)
    # a tactical position: CROSS has an open four a1-d1 -> e1/``0,0`` wins
    boards = np.zeros((B, H, W), np.int8)
    for c in range(1, 5):
        boards[:, 8, c] = CROSS
    for c in range(1, 4):
        boards[:, 7, c] = CIRCLE
    return tables, apply, variables, jnp.asarray(boards)


ALL_POLICIES = [
    "puct", "puct_fpu", "puct_variance", "ucb", "lcb",
    "thompson", "kl_ucb", "bayes_ucb",
]


@pytest.mark.parametrize("policy", ALL_POLICIES)
def test_policy_finds_win(setup, policy):
    tables, apply, variables, boards = setup
    stm = jnp.full((B,), CROSS, jnp.int8)
    cfg = mcts.MCTSConfig(
        max_nodes=48, max_edges=H * W, max_depth=8, policy=policy
    )
    state = jax.jit(
        lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, 24)
    )(variables, boards, stm)
    move = np.asarray(mcts.select_move(state))
    # completing the open four at row 8 col 0 or col 5 wins immediately
    assert set(move.tolist()) <= {8 * W + 0, 8 * W + 5}
    assert np.isfinite(np.asarray(mcts.root_value(state))).all()


def test_learnable_policy_runs(setup):
    tables, apply, variables, boards = setup
    stm = jnp.full((B,), CROSS, jnp.int8)
    cfg = mcts.MCTSConfig(
        max_nodes=48, max_edges=H * W, max_depth=8, policy="learnable",
        exploration_constant=1.0,
    )
    tp = tree_policy.init_params(jax.random.PRNGKey(1))
    state = jax.jit(
        lambda v, b, s: mcts.run_search(
            apply, v, tables, cfg, b, s, 24, tp_params=tp
        )
    )(variables, boards, stm)
    move = np.asarray(mcts.select_move(state))
    assert set(move.tolist()) <= {8 * W + 0, 8 * W + 5}


def test_tree_policy_training_step_reduces_loss():
    tp = tree_policy.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)
    feats = jax.random.normal(key, (64, 16, tree_policy.FEATURES))
    target = jax.nn.softmax(jax.random.normal(key, (64, 16)), -1)
    valid = jnp.ones((64, 16), bool)
    step = tree_policy.make_train_step(1e-2)
    _, loss0 = step(tp, feats, target, valid)
    params = tp
    for _ in range(50):
        params, loss = step(params, feats, target, valid)
    assert float(loss) < float(loss0)


@pytest.mark.parametrize("noise_type", ["dirichlet", "gumbel", "custom"])
def test_root_noise_types(setup, noise_type):
    tables, apply, variables, boards = setup
    stm = jnp.full((B,), CROSS, jnp.int8)
    cfg = mcts.MCTSConfig(
        max_nodes=16, max_edges=16, max_depth=4,
        noise_weight=0.25, noise_type=noise_type,
    )
    state = mcts.init_root(
        apply, variables, tables, cfg, boards, stm,
        noise_key=jax.random.PRNGKey(3),
    )
    noisy = np.asarray(state.noisy_prior)
    base_state = mcts.init_root(apply, variables, tables, cfg, boards, stm)
    base = np.asarray(base_state.noisy_prior)
    valid = np.asarray(base_state.tree.edge_action[:, 0]) != -1
    # still a distribution over valid edges, but different from the priors
    assert np.allclose(noisy.sum(-1), 1.0, atol=1e-4)
    assert np.all(noisy[~valid] == 0.0)
    assert not np.allclose(noisy[valid], base[valid])


def test_kl_ucb_fit_kl_bounds():
    # the KL upper bound stays in [p, 1) and grows with the budget T
    p = jnp.asarray([0.1, 0.5, 0.9])
    q1 = mcts._fit_kl(p, jnp.asarray([0.05, 0.05, 0.05]))
    q2 = mcts._fit_kl(p, jnp.asarray([0.5, 0.5, 0.5]))
    assert np.all(np.asarray(q1) >= np.asarray(p) - 1e-4)
    assert np.all(np.asarray(q2) >= np.asarray(q1) - 1e-4)
    assert np.all(np.asarray(q2) < 1.0)
