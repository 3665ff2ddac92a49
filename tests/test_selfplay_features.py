"""Selfplay strength features: between-move tree reuse, balanced-opening
wiring, and mid-generation preemption snapshots (reference:
Tree.cpp:128-151 subtree carry-over, GameGenerator.cpp PREPARE_OPENING,
GeneratorManager.cpp:240-291 mid-game state save/load)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import GameRules, GameOutcome, CROSS, CIRCLE
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.search import mcts
from alphagomoku_tpu.selfplay import (
    SelfplayConfig,
    play_games,
    play_games_resumable,
    generate_balanced_openings,
)

H = W = 9
B = 4


@pytest.fixture(scope="module")
def netup():
    net = create_network("FastPolicy", blocks=1, filters=8)
    x = jnp.zeros((1, H, W, net.cfg.input_planes), jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    apply = lambda v, p: net.apply(v, p, train=False)
    tables = V.device_tables(GameRules.FREESTYLE)
    return tables, apply, variables


def test_reuse_or_init_root_repoints(netup):
    tables, apply, variables = netup
    cfg = mcts.MCTSConfig(max_nodes=64, max_edges=16, max_depth=8)
    boards = jnp.zeros((B, H, W), jnp.int8)
    stm = jnp.full((B,), CROSS, jnp.int8)
    state = jax.jit(
        lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, 12)
    )(variables, boards, stm)

    rb = jnp.arange(B)
    # play the most-visited root move
    move = mcts.select_move(state)
    slot_actions = state.tree.edge_action[rb, state.root_node].astype(jnp.int32)
    slot = jnp.argmax(slot_actions == move[:, None], -1)
    child = state.tree.edge_child[rb, state.root_node, slot].astype(jnp.int32)

    env = V.EnvState(
        board=boards, to_move=stm,
        outcome=jnp.full(B, int(GameOutcome.UNKNOWN), jnp.int8),
        move_count=jnp.zeros(B, jnp.int32),
    )
    env2 = V.env_step(tables, env, move // W, move % W)
    state2 = jax.jit(
        lambda v, st, mv, b, s: mcts.reuse_or_init_root(
            apply, v, tables, cfg, st, mv, b, s, reserve=12
        )
    )(variables, state, move, env2.board, env2.to_move)

    child_np = np.asarray(child)
    reused = child_np != -1
    root2 = np.asarray(state2.root_node)
    # lanes with an expanded child repoint to it and keep its statistics
    assert (root2[reused] == child_np[reused]).all()
    if reused.any():
        i = int(np.argmax(reused))
        old_visits = int(state.tree.node_visits[i, child_np[i]])
        new_visits = int(state2.tree.node_visits[i, root2[i]])
        assert new_visits == old_visits
        assert int(state2.tree.node_count[i]) >= old_visits
    # fresh lanes start a 1-node tree
    fresh = ~reused
    if fresh.any():
        j = int(np.argmax(fresh))
        assert int(state2.tree.node_count[j]) == 1


def test_play_games_tree_reuse_runs(netup):
    tables, apply, variables = netup
    mcfg = mcts.MCTSConfig(max_nodes=96, max_edges=16, max_depth=8)
    scfg = SelfplayConfig(
        num_simulations=8, max_moves=12, temperature_moves=2, tree_reuse=True
    )
    res = jax.jit(
        lambda v, k: play_games(apply, v, tables, mcfg, scfg, k, B, H, W)
    )(variables, jax.random.PRNGKey(0))
    assert res.record.move.shape == (12, B)
    # all recorded moves land on empty cells of their position
    rec = res.record
    mv = np.asarray(rec.move)
    brd = np.asarray(rec.board)
    alive = np.asarray(rec.alive)
    for m in range(12):
        for b in range(B):
            if alive[m, b]:
                assert brd[m, b].flat[mv[m, b]] == 0


def test_resumable_snapshot_roundtrip(netup, tmp_path):
    tables, apply, variables = netup
    mcfg = mcts.MCTSConfig(max_nodes=24, max_edges=16, max_depth=6)
    scfg = SelfplayConfig(num_simulations=6, max_moves=8, temperature_moves=2)
    key = jax.random.PRNGKey(3)
    snap = os.path.join(tmp_path, "midgame.npz")

    # run to completion in one go (no stop)
    full = play_games_resumable(
        apply, variables, tables, mcfg, scfg, key, B, H, W,
        chunk_moves=4, snapshot_path=snap,
    )
    assert full is not None and not os.path.exists(snap)

    # now stop after the first chunk, snapshot, and resume
    calls = {"n": 0}

    def stop_after_first():
        calls["n"] += 1
        return calls["n"] >= 1

    part = play_games_resumable(
        apply, variables, tables, mcfg, scfg, key, B, H, W,
        chunk_moves=4, should_stop=stop_after_first, snapshot_path=snap,
    )
    assert part is None and os.path.exists(snap)

    resumed = play_games_resumable(
        apply, variables, tables, mcfg, scfg, key, B, H, W,
        chunk_moves=4, snapshot_path=snap,
    )
    assert resumed is not None and not os.path.exists(snap)
    # deterministic: the pre-stop chunk replays identically
    np.testing.assert_array_equal(
        np.asarray(full.record.move[:4]), np.asarray(resumed.record.move[:4])
    )
    assert resumed.record.move.shape == (8, B)


def test_balanced_openings_playable(netup):
    tables, apply, variables = netup
    boards = jax.jit(
        lambda v, k: generate_balanced_openings(
            apply, v, tables, k, 8, H, W, stones=4
        )
    )(variables, jax.random.PRNGKey(1))
    b = np.asarray(boards)
    assert b.shape == (8, H, W)
    assert ((b != 0).sum((1, 2)) == 4).all()
    # alternating colors: 2 cross + 2 circle
    assert ((b == CROSS).sum((1, 2)) == 2).all()
    assert ((b == CIRCLE).sum((1, 2)) == 2).all()
