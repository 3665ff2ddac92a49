"""Full-stack rule coverage: search + selfplay run under every rule variant
and board size the reference supports (BASELINE: freestyle 15x15/20x20,
standard, renju, caro5/caro6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import CROSS, CIRCLE, GameRules, GameOutcome
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.search import mcts


def _net(h, w):
    net = create_network("FastPolicy", blocks=1, filters=8)
    x = jnp.zeros((1, h, w, net.cfg.input_planes), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    return (lambda v, p: net.apply(v, p, train=False)), variables


@pytest.mark.parametrize(
    "rules", [GameRules.STANDARD, GameRules.RENJU, GameRules.CARO5, GameRules.CARO6]
)
def test_search_under_rule_variant(rules):
    h = w = 11
    apply, variables = _net(h, w)
    tables = V.device_tables(rules)
    board = np.zeros((1, h, w), np.int8)
    board[0, 5, 3:7] = CROSS  # four in a row
    board[0, 3, 3:6] = CIRCLE
    cfg = mcts.MCTSConfig(max_nodes=40, max_edges=h * w, max_depth=8)
    state = jax.jit(
        lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, 32)
    )(variables, jnp.asarray(board), jnp.full((1,), CROSS, jnp.int8))
    mv = int(np.asarray(mcts.select_move(state))[0])
    r, c = mv // w, mv % w
    # for every variant the open-four completion wins immediately
    assert (r, c) in [(5, 2), (5, 7)], f"{rules.name}: got {(r, c)}"


def test_renju_search_avoids_forbidden():
    """Black has a double-three fork cell — forbidden under renju, so the
    search must never expand it for black."""
    h = w = 11
    apply, variables = _net(h, w)
    tables = V.device_tables(GameRules.RENJU)
    board = np.zeros((1, h, w), np.int8)
    # two open twos through (5,5): placing there creates a 3x3 fork
    board[0, 5, 3] = CROSS
    board[0, 5, 4] = CROSS
    board[0, 3, 5] = CROSS
    board[0, 4, 5] = CROSS
    board[0, 0, 0] = CIRCLE
    board[0, 0, 1] = CIRCLE
    board[0, 10, 10] = CIRCLE
    # confirm the fork cell is indeed forbidden
    plane = np.asarray(V.forbidden_plane(tables, jnp.asarray(board)))[0]
    assert plane[5, 5], "test setup: (5,5) should be forbidden"
    cfg = mcts.MCTSConfig(max_nodes=70, max_edges=h * w, max_depth=8)
    state = jax.jit(
        lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, 64)
    )(variables, jnp.asarray(board), jnp.full((1,), CROSS, jnp.int8))
    actions = np.asarray(state.tree.edge_action[0, 0])
    assert (5 * w + 5) not in actions[actions >= 0], "forbidden cell expanded"


def test_search_20x20():
    h = w = 20
    apply, variables = _net(h, w)
    tables = V.device_tables(GameRules.FREESTYLE)
    board = np.zeros((1, h, w), np.int8)
    board[0, 10, 8:12] = CROSS
    board[0, 12, 8:11] = CIRCLE
    cfg = mcts.MCTSConfig(max_nodes=40, max_edges=64, max_depth=8)
    state = jax.jit(
        lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, 32)
    )(variables, jnp.asarray(board), jnp.full((1,), CROSS, jnp.int8))
    mv = int(np.asarray(mcts.select_move(state))[0])
    r, c = mv // w, mv % w
    assert (r, c) in [(10, 7), (10, 12)], f"got {(r, c)}"


def test_caro5_blocked_five_does_not_win():
    """caro5: a five blocked on both ends is NOT a win — the env must agree
    through the full step path."""
    tables = V.device_tables(GameRules.CARO5)
    h = w = 11
    board = np.zeros((1, h, w), np.int8)
    board[0, 5, 2] = CIRCLE  # left blocker
    board[0, 5, 3:7] = CROSS
    board[0, 5, 8] = CIRCLE  # right blocker (after the five completes)
    env = V.EnvState(
        board=jnp.asarray(board),
        to_move=jnp.full(1, CROSS, jnp.int8),
        outcome=jnp.full(1, int(GameOutcome.UNKNOWN), jnp.int8),
        move_count=jnp.full(1, 7, jnp.int32),
    )
    env2 = V.env_step(tables, env, jnp.asarray([5]), jnp.asarray([7]))
    assert int(np.asarray(env2.outcome)[0]) == int(GameOutcome.UNKNOWN)
    # the same five under freestyle DOES win
    tables_f = V.device_tables(GameRules.FREESTYLE)
    env3 = V.env_step(tables_f, env, jnp.asarray([5]), jnp.asarray([7]))
    assert int(np.asarray(env3.outcome)[0]) == int(GameOutcome.CROSS_WIN)


def test_opening_generator_masks():
    """Center/symmetry opening restrictions (reference: the specialized
    EdgeGenerators used by swap controllers)."""
    import jax.numpy as jnp
    from alphagomoku_tpu.search import generators as G

    m = np.asarray(G.center_excluding_mask(1, 15, 15, 3))[0]
    assert not m[7, 7] and not m[5, 9]  # inside the excluded square
    assert m[3, 7] and m[0, 0]
    mo = np.asarray(G.center_only_mask(1, 15, 15, 1))[0]
    assert mo[7, 7] and mo[6, 8] and not mo[0, 0]

    # empty board: full 8-way symmetry leaves ~1/8 of cells as orbit reps
    empty = jnp.zeros((1, 9, 9), jnp.int8)
    sm = np.asarray(G.symmetrical_excluding_mask(empty))[0]
    assert sm.sum() < 81 / 4
    assert sm[0, 0]  # the canonical corner survives
    # asymmetric board: no invariant symmetry except identity -> all allowed
    b = np.zeros((1, 9, 9), np.int8)
    b[0, 2, 3] = CROSS
    b[0, 5, 1] = CIRCLE
    sm2 = np.asarray(G.symmetrical_excluding_mask(jnp.asarray(b)))[0]
    assert sm2.all()


def test_root_move_mask_restricts_search():
    import jax.numpy as jnp
    from alphagomoku_tpu.search import generators as G

    h = w = 9
    apply, variables = _net(h, w)
    tables = V.device_tables(GameRules.FREESTYLE)
    board = jnp.zeros((1, h, w), jnp.int8)
    cfg = mcts.MCTSConfig(max_nodes=24, max_edges=16, max_depth=6)
    mask = G.center_only_mask(1, h, w, 1)
    state = jax.jit(
        lambda v, b, s: mcts.run_search(
            apply, v, tables, cfg, b, s, 16, root_move_mask=mask
        )
    )(variables, board, jnp.full((1,), CROSS, jnp.int8))
    actions = np.asarray(state.tree.edge_action[0, 0])
    for a in actions[actions >= 0]:
        r, c = a // w, a % w
        assert max(abs(r - 4), abs(c - 4)) <= 1, (r, c)
