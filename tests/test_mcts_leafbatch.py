"""Multi-leaf (virtual loss) MCTS tests: leaf_batch > 1 must preserve
search correctness (reference: SearchTaskList batching, Search.hpp:56-96)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import NONE, CROSS, CIRCLE, GameRules
from alphagomoku_tpu.game import board as board_mod
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
    return (lambda v, p: net.apply(v, p, train=False)), variables


@pytest.fixture(scope="module")
def tables():
    return V.device_tables(GameRules.FREESTYLE)


def run(net_and_vars, tables, boards, stm, sims, leaf_batch):
    apply, variables = net_and_vars
    cfg = mcts.MCTSConfig(
        max_nodes=sims + 8, max_edges=H * W, max_depth=16, leaf_batch=leaf_batch
    )
    f = jax.jit(
        lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, sims)
    )
    return f(variables, jnp.asarray(boards), jnp.asarray(stm))


@pytest.mark.parametrize("leaf_batch", [2, 4])
def test_visit_accounting(net_and_vars, tables, leaf_batch):
    boards = np.zeros((2, H, W), np.int8)
    boards[1, 4, 4] = CROSS
    stm = np.array([CROSS, CIRCLE], np.int8)
    state = run(net_and_vars, tables, boards, stm, sims=64, leaf_batch=leaf_batch)
    tree = state.tree
    root_visits = np.asarray(tree.node_visits[:, 0])
    assert (root_visits >= 48).all()  # most sims pass through the root
    rb = jnp.arange(tree.batch)
    edge_visits = np.asarray(
        mcts.edge_stats(tree, rb, state.root_node).visits
    ).sum(-1)
    assert (edge_visits <= root_visits).all()
    counts = np.asarray(tree.node_count)
    assert (counts > leaf_batch).all() and (counts <= tree.capacity).all()
    dist = np.asarray(mcts.root_visit_distribution(state))
    assert np.allclose(dist.sum((1, 2)), 1.0, atol=1e-5)


@pytest.mark.parametrize("leaf_batch", [2, 4])
def test_finds_win_with_leaf_batch(net_and_vars, tables, leaf_batch):
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
    state = run(
        net_and_vars, tables, boards, np.array([CROSS], np.int8), 128, leaf_batch
    )
    move = int(np.asarray(mcts.select_move(state))[0])
    assert (move // W, move % W) in [(4, 0), (4, 5)]
    assert bool(np.asarray(S.is_win(jnp.asarray(state.tree.node_score[:, 0])))[0])


def test_blocks_with_leaf_batch(net_and_vars, tables):
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
    state = run(
        net_and_vars, tables, boards, np.array([CIRCLE], np.int8), 256, 4
    )
    move = int(np.asarray(mcts.select_move(state))[0])
    assert (move // W, move % W) == (4, 5)


def test_symmetry_averaging_search(net_and_vars, tables):
    """Per-evaluation symmetry averaging (reference: NNEvaluator random
    augmentation) must not break tactical play."""
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
    apply, variables = net_and_vars
    cfg = mcts.MCTSConfig(
        max_nodes=136, max_edges=H * W, max_depth=16, symmetry_averaging=True
    )
    boards = board_mod.from_string(txt)[None]
    f = jax.jit(lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, 128))
    state = f(variables, jnp.asarray(boards), jnp.asarray([CROSS], np.int8))
    move = int(np.asarray(mcts.select_move(state))[0])
    assert (move // W, move % W) in [(4, 0), (4, 5)]


@pytest.mark.parametrize("policy", ["puct_fpu", "ucb"])
def test_selector_policies_find_win(net_and_vars, tables, policy):
    """Alternative in-tree policies (reference EdgeSelector zoo) still find
    the forced win."""
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
    apply, variables = net_and_vars
    cfg = mcts.MCTSConfig(max_nodes=72, max_edges=H * W, max_depth=16, policy=policy)
    boards = board_mod.from_string(txt)[None]
    f = jax.jit(lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, 64))
    state = f(variables, jnp.asarray(boards), jnp.asarray([CROSS], np.int8))
    move = int(np.asarray(mcts.select_move(state))[0])
    assert (move // W, move % W) in [(4, 0), (4, 5)]
