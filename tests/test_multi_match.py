"""Multi-opponent rating + BestEdge final selection + async evaluation
(reference: EvaluationManager.hpp:29-52 multi-opponent second players,
EdgeSelector.cpp:515-536 BestEdge ordering, TrainingManager.cpp:100-126
async evaluation future)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import GameRules, CROSS
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.search import mcts
from alphagomoku_tpu.eval.match import Opponent, play_multi_match, random_openings


@pytest.fixture(scope="module")
def tables():
    return V.device_tables(GameRules.FREESTYLE)


def _net(seed, filters=8):
    net = create_network("FastPolicy", blocks=1, filters=filters)
    x = jnp.zeros((1, 9, 9, net.cfg.input_planes), jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(seed), x, train=False)
    return net, variables


def test_play_multi_match_blocks_and_scores(tables):
    """One candidate vs two opponents: per-opponent pentanomials from one
    lockstep run, same openings replayed in every block."""
    net_a, va = _net(0)
    net_b, vb = _net(1)
    net_c, vc = _net(2)

    def apply_of(net):
        return lambda v, planes: net.apply(v, planes, train=False)

    rng = np.random.default_rng(0)
    openings = random_openings(rng, 2, 9, 9, stones=4)
    mcfg = mcts.MCTSConfig(max_nodes=12, max_edges=16, max_depth=8)
    results = play_multi_match(
        apply_of(net_a), va,
        [Opponent(apply_of(net_b), vb), Opponent(apply_of(net_c), vc)],
        tables, mcfg, num_simulations=8, openings=openings,
    )
    assert len(results) == 2
    for res in results:
        assert res.pentanomial.sum() == 2  # 2 pairs per opponent
        assert 0.0 <= res.score_a <= 1.0
        assert res.outcomes.shape == (4,)
        # max_moves=None plays to outcome: nothing truncated
        assert res.truncated == 0


def test_truncation_adjudicates_not_free_draws(tables):
    """A capped match value-adjudicates unfinished games instead of
    scoring free draws."""
    net_a, va = _net(0)
    net_b, vb = _net(1)

    def apply_of(net):
        return lambda v, planes: net.apply(v, planes, train=False)

    rng = np.random.default_rng(1)
    openings = random_openings(rng, 2, 9, 9, stones=4)
    mcfg = mcts.MCTSConfig(max_nodes=12, max_edges=16, max_depth=8)
    res = play_multi_match(
        apply_of(net_a), va, [Opponent(apply_of(net_b), vb)],
        tables, mcfg, num_simulations=8, openings=openings, max_moves=8,
    )[0]
    # 4 stones + 4 plies cannot finish a freestyle game: all truncated,
    # every game got a definite adjudicated verdict counted in pentanomial
    assert res.truncated == 4
    assert res.pentanomial.sum() == 2


def test_select_move_best_edge_ordering():
    """select_move mirrors BestEdge exactly: visits + q*parent_visits +
    0.001*prior, WIN pinned above everything, LOSS below."""
    from alphagomoku_tpu.search import score as S

    cfg = mcts.MCTSConfig(max_nodes=8, max_edges=4, max_depth=4)
    tree = mcts.init_tree(1, cfg)
    # root node 0: 3 edges to child nodes 1/2/3 (edge stats are derived
    # from the children): visits 10/9/1; parent-view q 0.2/0.9/0.5 means
    # child win rates 0.8/0.1/0.5; parent visits 20
    q = jnp.asarray([0.2, 0.9, 0.5])
    n = jnp.asarray([10.0, 9.0, 1.0])
    tree = tree._replace(
        node_visits=tree.node_visits.at[0, 0].set(20)
        .at[0, 1:4].set(n.astype(jnp.int32)),
        node_value_sum=tree.node_value_sum.at[0, 1:4, 0].set((1.0 - q) * n),
        edge_action=tree.edge_action.at[0, 0, :3].set(
            jnp.asarray([5, 6, 7], jnp.int16)
        ),
        edge_child=tree.edge_child.at[0, 0, :3].set(
            jnp.asarray([1, 2, 3], jnp.int16)
        ),
        node_count=tree.node_count.at[0].set(4),
    )
    state = mcts.SearchState(
        tree=tree,
        root_board=jnp.zeros((1, 9, 9), jnp.int8),
        root_stm=jnp.full((1,), CROSS, jnp.int8),
        root_node=jnp.zeros(1, jnp.int32),
        noisy_prior=jnp.zeros((1, 4), jnp.float32),
        sims_done=jnp.zeros(1, jnp.int32),
        stats=mcts.SearchStats.zeros(1),
    )
    # slot1: 9 + 0.9*20 = 27 beats slot0: 10 + 0.2*20 = 14 (value-weighted,
    # NOT max-visits — the reference BestEdge semantics)
    assert int(mcts.select_move(state)[0]) == 6
    # a proven WIN edge with fewer visits dominates
    tree2 = tree._replace(
        edge_score=tree.edge_score.at[0, 0, 2].set(S.win_in(3))
    )
    assert int(mcts.select_move(state._replace(tree=tree2))[0]) == 7
    # a proven LOSS edge is avoided even with the best stats
    tree3 = tree._replace(
        edge_score=tree.edge_score.at[0, 0, 1].set(S.loss_in(2))
    )
    assert int(mcts.select_move(state._replace(tree=tree3))[0]) == 5


def test_manager_async_evaluation(tmp_path):
    """use_evaluation writes rating.txt entries for prior checkpoints,
    overlapped via the evaluation future."""
    from alphagomoku_tpu.training.manager import ManagerConfig, TrainingManager

    cfg = ManagerConfig(
        working_dir=str(tmp_path),
        rules=GameRules.FREESTYLE,
        rows=9,
        cols=9,
        architecture="FastPolicy",
        blocks=1,
        filters=8,
        games_per_iteration=4,
        selfplay_batch=4,
        num_simulations=8,
        train_steps_per_iteration=2,
        train_batch_size=16,
        use_evaluation=True,
        eval_opponents=(-1, -2),
        eval_games=4,
        leaf_solver="none",
        tree_reuse=False,
        use_gating=False,
        eval_in_parallel=True,
        balanced_openings=False,
        seed=0,
    )
    mgr = TrainingManager(cfg)
    mgr.run_iteration_rl(0)  # no prior checkpoints -> no rating entries
    mgr.run_iteration_rl(1)  # rates 1 vs 0 (async)
    mgr.join_evaluation()
    rating = os.path.join(str(tmp_path), "rating.txt")
    assert os.path.exists(rating)
    lines = [json.loads(l) for l in open(rating)]
    assert any(e["iteration"] == 1 and e["opponent"] == "AG_000" for e in lines)
    for e in lines:
        assert 0.0 <= e["score"] <= 1.0
        assert sum(e["pentanomial"]) == cfg.eval_games // 2
