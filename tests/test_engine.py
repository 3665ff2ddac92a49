"""End-to-end engine test: protocol lines in -> best move out
(reference capability: player_launcher + GomocupProtocol round trip)."""

import numpy as np
import pytest

from alphagomoku_tpu.engine.manager import ProgramManager


@pytest.fixture(scope="module")
def manager():
    mgr = ProgramManager(
        protocol="extended",
        architecture="FastPolicy",
        blocks=1,
        filters=16,
        simulations=24,
    )
    mgr.options["time_for_turn"] = "30000"
    mgr.options["time_left"] = "30000"
    return mgr


def drive(mgr, *lines):
    for line in lines:
        mgr.listener.push_line(line)
    out: list[str] = []
    orig = mgr.sender._sink
    mgr.sender._sink = out.append
    try:
        while not mgr.listener.is_empty():
            mgr.run_once()
    finally:
        mgr.sender._sink = orig
    return out


def test_start_and_turn(manager):
    out = drive(manager, "START 15")
    assert out == ["OK"]
    out = drive(manager, "TURN 7,7")
    moves = [l for l in out if "," in l and not l.startswith(("MESSAGE", "ERROR"))]
    assert len(moves) == 1
    r, c = map(int, moves[0].split(","))
    assert 0 <= r < 15 and 0 <= c < 15 and (r, c) != (7, 7)
    # the protocol tracks both moves (the engine position is refreshed by
    # SET_POSITION on the next command, as in the reference)
    assert len(manager.protocol.list_of_moves) == 2


def test_engine_blocks_four(manager):
    """After BOARD with an open cross four, the engine (circle) must block
    or the static solver has failed."""
    out = drive(
        manager,
        "RESTART",
        "BOARD",
        "7,3,2", "7,4,2", "7,5,2", "7,6,2",  # opponent (cross) four in a row
        "2,2,1", "3,3,1", "4,4,1",  # own scattered stones
        "DONE",
    )
    moves = [l for l in out if "," in l and not l.startswith(("MESSAGE", "ERROR"))]
    assert len(moves) == 1
    r, c = map(int, moves[0].split(","))
    assert (r, c) in [(7, 2), (7, 7)], f"engine failed to block: {(r, c)}"


def test_showforbid(manager):
    out = drive(manager, "RESTART")
    manager.options["rules"] = "RENJU"
    manager.engine = None
    out = drive(manager, "SHOWFORBID")
    assert any(l.startswith("FORBID") for l in out)
    manager.options["rules"] = "FREESTYLE"
    manager.engine = None


def test_ponder_and_stop(manager):
    """Background pondering starts and STOP terminates it cleanly."""
    import time

    drive(manager, "RESTART")
    out = drive(manager, "PONDER")
    time.sleep(1.0)
    assert manager._bg_search is not None
    out = drive(manager, "STOP")
    assert manager._bg_search is None
    # engine remains usable after the stop
    out = drive(manager, "TURN 3,3")
    moves = [l for l in out if "," in l and not l.startswith(("MESSAGE", "ERROR"))]
    assert len(moves) == 1


def test_tree_reuse_between_moves():
    """Advancing the position along the searched best move reuses the
    previous subtree (reference: NodeCache subtree carry-over)."""
    from alphagomoku_tpu.engine.engine import Engine
    from alphagomoku_tpu.game.types import GameRules

    eng = Engine(
        rules=GameRules.FREESTYLE, rows=9, cols=9,
        architecture="FastPolicy", blocks=1, filters=8,
        simulations=64, sim_chunk=64,
    )
    eng.set_position([])
    s1 = eng.search()
    assert eng.reuse_count == 0
    eng.make_move(s1.best_move)  # the best edge has a well-visited child
    s2 = eng.search()
    assert eng.reuse_count == 1
    assert s2.nodes > 64  # carried statistics, not a fresh tree
