"""Transposition handling: the hash probe must share nodes across move
orders (reference capability: NodeCache transposition-table tree,
NodeCache.hpp:51-120)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import CROSS, GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.search import mcts

H = W = 9


@pytest.fixture(scope="module")
def setup():
    net = create_network("FastPolicy", blocks=1, filters=8)
    x = jnp.zeros((1, H, W, net.cfg.input_planes), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    tables = V.device_tables(GameRules.FREESTYLE)
    return (lambda v, p: net.apply(v, p, train=False)), variables, tables


def run(setup, use_tt, sims=300):
    apply, variables, tables = setup
    cfg = mcts.MCTSConfig(
        max_nodes=sims + 8,
        max_edges=8,  # narrow trees force move-order transpositions
        max_depth=16,
        use_transpositions=use_tt,
    )
    boards = jnp.zeros((1, H, W), jnp.int8)
    stm = jnp.full((1,), CROSS, jnp.int8)
    f = jax.jit(lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, sims))
    return f(variables, boards, stm)


def test_transpositions_share_nodes(setup):
    with_tt = run(setup, True)
    without_tt = run(setup, False)
    # allocation is lockstep-uniform (node_count = frontier, not #used
    # nodes), so sharing shows up as transposition hits + fewer expansions
    tt_hits = int(np.asarray(with_tt.stats.transpositions)[0])
    assert tt_hits > 0, "expected transposition hits on move-order swaps"
    exp_with = int(np.asarray(with_tt.stats.expansions)[0])
    exp_without = int(np.asarray(without_tt.stats.expansions)[0])
    assert exp_with < exp_without, (exp_with, exp_without)
    # both searches stay well-formed
    for st in (with_tt, without_tt):
        dist = np.asarray(mcts.root_visit_distribution(st))
        assert np.allclose(dist.sum(), 1.0, atol=1e-5)
        assert int(np.asarray(st.tree.node_visits[0, 0])) >= 290


def test_edges_link_to_existing_nodes(setup):
    state = run(setup, True, sims=200)
    tree = state.tree
    child = np.asarray(tree.edge_child[0])
    count = int(np.asarray(tree.node_count)[0])
    linked = child[child >= 0]
    assert (linked < count).all()  # no dangling links
    # transpositions make the structure a DAG: some node is referenced by
    # two or more parent edges
    uniq, counts = np.unique(linked, return_counts=True)
    assert (counts >= 2).any(), "expected at least one shared (transposed) node"
