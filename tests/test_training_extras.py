"""Zobrist, selectors, validation/distillation, gating tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import CROSS, CIRCLE, GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.search import mcts, selectors, zobrist
from alphagomoku_tpu.training import (
    TrainConfig,
    create_train_state,
    make_distill_step,
    make_eval_step,
)
from tests.test_data_eval import fake_targets


def test_zobrist_full_hash():
    t = zobrist.make_table(9, 9)
    b1 = np.zeros((2, 9, 9), np.int8)
    b1[0, 4, 4] = CROSS
    b1[1, 4, 4] = CIRCLE
    stm = jnp.full(2, CROSS, jnp.int8)
    h = np.asarray(zobrist.full_hash(t, jnp.asarray(b1), stm))
    assert h.shape == (2, zobrist.FULL_LANES)
    assert (h[0] != h[1]).any()  # different stones -> different hash
    # side to move matters
    h2 = np.asarray(
        zobrist.full_hash(t, jnp.asarray(b1), jnp.full(2, CIRCLE, jnp.int8))
    )
    assert (h != h2).any(axis=-1).all()


def test_zobrist_incremental_matches_full_recompute():
    t = zobrist.make_table(9, 9)
    rng = np.random.default_rng(0)
    board = np.zeros((1, 9, 9), np.int8)
    h = zobrist.incremental_hash(t, jnp.asarray(board))
    for i in range(10):
        cell = int(rng.integers(0, 81))
        while board[0].flat[cell] != 0:
            cell = int(rng.integers(0, 81))
        sign = CROSS if i % 2 == 0 else CIRCLE
        board[0].flat[cell] = sign
        h = zobrist.update_hash(
            t, h, jnp.asarray([cell]), jnp.asarray([sign], jnp.int8)
        )
    h2 = zobrist.incremental_hash(t, jnp.asarray(board))
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h2))
    # XOR self-inverse: applying the same move twice restores the hash
    cell_arr = jnp.asarray([cell])
    sign_arr = jnp.asarray([sign], jnp.int8)
    h3 = zobrist.update_hash(t, h, cell_arr, sign_arr)
    h4 = zobrist.update_hash(t, h3, cell_arr, sign_arr)
    np.testing.assert_array_equal(np.asarray(h4), np.asarray(h))


@pytest.fixture(scope="module")
def searched_state():
    net = create_network("FastPolicy", blocks=1, filters=8)
    x = jnp.zeros((1, 9, 9, net.cfg.input_planes), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    tables = V.device_tables(GameRules.FREESTYLE)
    apply = lambda v, p: net.apply(v, p, train=False)
    cfg = mcts.MCTSConfig(max_nodes=40, max_edges=16, max_depth=8)
    boards = jnp.zeros((2, 9, 9), jnp.int8)
    stm = jnp.full(2, CROSS, jnp.int8)
    return jax.jit(
        lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, 32)
    )(variables, boards, stm)


@pytest.mark.parametrize(
    "policy", ["best", "max_visit", "min_visit", "max_value", "max_policy", "balanced"]
)
def test_selector_family(searched_state, policy):
    mv = np.asarray(selectors.select(searched_state, policy))
    assert mv.shape == (2,)
    assert ((mv >= 0) & (mv < 81)).all()


def test_eval_step_metrics():
    net = create_network("ResnetPV", blocks=1, filters=8)
    tables = V.device_tables(GameRules.FREESTYLE)
    x = jnp.zeros((1, 9, 9, net.cfg.input_planes), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    cfg = TrainConfig()
    state, tx = create_train_state(net, variables, cfg)
    ev = jax.jit(make_eval_step(net, tables, cfg))
    batch = {k: jnp.asarray(v) for k, v in fake_targets(64).items()}
    parts = ev(state, batch)
    assert np.isfinite(float(parts["total"]))
    assert 0.0 <= float(parts["top1_accuracy"]) <= 1.0
    assert float(parts["top5_accuracy"]) >= float(parts["top1_accuracy"])


def test_distillation_reduces_gap():
    tables = V.device_tables(GameRules.FREESTYLE)
    teacher = create_network("ResnetPV", blocks=2, filters=16)
    student = create_network("ResnetPV", blocks=1, filters=8)
    x32 = jnp.zeros((1, 9, 9, 32), jnp.float32)
    tvars = teacher.init(jax.random.PRNGKey(1), x32, train=False)
    svars = student.init(jax.random.PRNGKey(2), x32, train=False)
    cfg = TrainConfig(augment_symmetries=False)
    state, tx = create_train_state(student, svars, cfg)
    step = jax.jit(make_distill_step(student, teacher, tx, tables, cfg))
    batch = {k: jnp.asarray(v) for k, v in fake_targets(64, seed=9).items()}
    losses = []
    for i in range(6):
        state, parts = step(state, tvars, batch, jax.random.PRNGKey(i))
        losses.append(float(parts["total"]))
    assert losses[-1] < losses[0], f"distillation loss should fall: {losses}"
