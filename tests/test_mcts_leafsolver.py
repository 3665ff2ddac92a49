"""Per-leaf/root proof search fused into the MCTS step (reference: the
solver leg of the search pipeline — AlphaBetaSearch::solve run on every
task batch, Search.cpp:159-183)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import CROSS, CIRCLE, GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.search import mcts
from alphagomoku_tpu.search import score as S

H = W = 9


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


def fork_board():
    """X to move: (4,4) makes a double open three — a VCT win invisible to
    the static stages (win_in_3 needs an existing four threat)."""
    b = np.zeros((H, W), np.int8)
    b[2, 4] = b[3, 4] = b[4, 2] = b[4, 3] = CROSS
    b[7, 0] = b[8, 0] = b[7, 8] = b[8, 8] = CIRCLE
    return b


def run(net_and_vars, tables, boards, stm, sims, cfg):
    apply, variables = net_and_vars
    f = jax.jit(
        lambda v, b, s: mcts.run_search(
            apply, v, tables, cfg, b, s, sims, raw_input=True
        )
    )
    return f(variables, jnp.asarray(boards), jnp.asarray(stm))


def test_root_vct_win_proven(net_and_vars, tables):
    boards = fork_board()[None]
    stm = np.array([CROSS], np.int8)
    cfg = mcts.MCTSConfig(
        max_nodes=64, max_edges=H * W, max_depth=16, leaf_solver="vct")
    state = run(net_and_vars, tables, boards, stm, sims=8, cfg=cfg)
    root_score = np.asarray(state.tree.node_score[:, 0])
    assert bool(S.is_win(root_score[0])), hex(int(root_score[0]))
    mv = int(np.asarray(mcts.select_move(state))[0])
    assert mv == 4 * W + 4, (mv // W, mv % W)


def test_without_solver_not_proven(net_and_vars, tables):
    """Contrast: the same tiny search without the solver cannot prove the
    fork (static stages alone see at most win_in_3)."""
    boards = fork_board()[None]
    stm = np.array([CROSS], np.int8)
    cfg = mcts.MCTSConfig(
        max_nodes=64, max_edges=H * W, max_depth=16, leaf_solver="none")
    state = run(net_and_vars, tables, boards, stm, sims=8, cfg=cfg)
    root_score = np.asarray(state.tree.node_score[:, 0])
    assert not bool(S.is_win(root_score[0]))


def test_leaf_solver_proves_defender_children(net_and_vars, tables):
    """O to move on the fork board: X-to-move leaf positions are solved, so
    visited root edges that fail to defend become proven losses for O."""
    boards = fork_board()[None]
    stm = np.array([CIRCLE], np.int8)
    cfg = mcts.MCTSConfig(
        max_nodes=128, max_edges=H * W, max_depth=16, leaf_solver="vct",
        leaf_batch=4)
    state = run(net_and_vars, tables, boards, stm, sims=48, cfg=cfg)
    tree = state.tree
    escore = np.asarray(tree.edge_score[0, 0])
    valid = np.asarray(tree.edge_action[0, 0]) >= 0
    losses = S.is_loss(escore) & valid
    assert losses.sum() >= 4, f"only {losses.sum()} proven-loss edges"


def test_vcf_leaf_solver_smoke(net_and_vars, tables):
    """The cheaper VCF-only solver config also compiles and proves a pure
    four-chain win at the root."""
    b = np.zeros((H, W), np.int8)
    b[4, 2] = b[4, 3] = b[4, 4] = b[4, 5] = CROSS  # four: immediate win
    b[5, 2] = b[5, 3] = b[5, 4] = CIRCLE
    cfg = mcts.MCTSConfig(
        max_nodes=32, max_edges=H * W, max_depth=8, leaf_solver="vcf")
    state = run(net_and_vars, tables, b[None], np.array([CROSS], np.int8),
                sims=4, cfg=cfg)
    root_score = np.asarray(state.tree.node_score[:, 0])
    assert bool(S.is_win(root_score[0]))


def test_solver_cap_preserves_proofs(net_and_vars, tables):
    """leaf_solver_cap compacts the solve to the threat-bearing leaves; a
    batch mixing tactical and quiet boards must prove exactly what the
    uncapped solve proves (quiet leaves have no root candidates, so the
    compaction can only skip no-ops)."""
    boards = np.zeros((6, H, W), np.int8)
    boards[0] = fork_board()
    boards[1, 4, 2] = boards[1, 4, 3] = boards[1, 4, 4] = boards[1, 4, 5] = CROSS
    boards[1, 5, 2] = boards[1, 5, 3] = boards[1, 5, 4] = CIRCLE
    boards[2, 0, 0] = CROSS  # quiet
    boards[3, 8, 8] = CIRCLE  # quiet
    # boards 4-5 stay empty (quiet)
    stm = np.full(6, CROSS, np.int8)
    kw = dict(max_nodes=64, max_edges=H * W, max_depth=16, leaf_solver="vct")
    full = run(net_and_vars, tables, boards, stm, sims=8,
               cfg=mcts.MCTSConfig(**kw))
    capped = run(net_and_vars, tables, boards, stm, sims=8,
                 cfg=mcts.MCTSConfig(**kw, leaf_solver_cap=2))
    sf = np.asarray(full.tree.node_score[:, 0])
    sc = np.asarray(capped.tree.node_score[:, 0])
    assert S.is_win(sf[0]) and S.is_win(sf[1])
    np.testing.assert_array_equal(S.is_win(sf), S.is_win(sc))
    mf = np.asarray(mcts.select_move(full))
    mc = np.asarray(mcts.select_move(capped))
    np.testing.assert_array_equal(mf[:2], mc[:2])
