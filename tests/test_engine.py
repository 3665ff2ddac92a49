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


def test_swap2_two_stone_balancing(manager, monkeypatch):
    """A balanced 3-stone swap2 opening (expectation in (1/3, 2/3)) is
    answered with TWO balancing stones of the correct signs (reference:
    Swap2Controller.cpp:86-131 second_balancing_move)."""
    from alphagomoku_tpu.engine import engine as E
    from alphagomoku_tpu.game.types import Move, CROSS, CIRCLE

    drive(manager, "START 15")
    eng = manager._setup_engine()

    def fake_search(self, time_budget=None, selector="best", on_chunk=None,
                    max_sims=None):
        stm = self.sign_to_move()
        # deterministic distinct cells away from the opening stones
        taken = {(m.row, m.col) for m in self.moves}
        for r in range(self.rows):
            for c in range(self.cols):
                if (r, c) not in taken:
                    return E.SearchSummary(
                        best_move=Move(row=r, col=c, sign=stm),
                        expectation=0.5, win_rate=0.4, draw_rate=0.2,
                        simulations=1, nodes=1, time_used=0.0,
                        principal_variation=[], proven="",
                    )
        raise AssertionError("no empty cell")

    monkeypatch.setattr(E.Engine, "search", fake_search)
    out = drive(manager, "SWAP2BOARD", "7,7", "8,8", "9,7", "DONE")
    answers = [l for l in out if "," in l and not l.startswith(("MESSAGE", "ERROR"))]
    assert len(answers) == 1
    parts = answers[0].split()
    assert len(parts) == 2, answers  # two balancing stones
    # protocol appended both stones: 3 openings + 2 balancing
    assert len(manager.protocol.list_of_moves) == 5
    assert manager.protocol.list_of_moves[-2].sign == CIRCLE  # white 2nd stone
    assert manager.protocol.list_of_moves[-1].sign == CROSS   # black 3rd stone


def test_swap2_extremes_swap_or_move(manager, monkeypatch):
    """Expectation below 1/3 answers SWAP; above 2/3 answers one move."""
    from alphagomoku_tpu.engine import engine as E
    from alphagomoku_tpu.game.types import Move

    for expectation, expect_swap in ((0.2, True), (0.8, False)):
        drive(manager, "START 15")

        def fake_search(self, time_budget=None, selector="best", on_chunk=None,
                        max_sims=None, _e=expectation):
            stm = self.sign_to_move()
            taken = {(m.row, m.col) for m in self.moves}
            cell = next((r, c) for r in range(self.rows)
                        for c in range(self.cols) if (r, c) not in taken)
            return E.SearchSummary(
                best_move=Move(row=cell[0], col=cell[1], sign=stm),
                expectation=_e, win_rate=_e, draw_rate=0.0,
                simulations=1, nodes=1, time_used=0.0,
                principal_variation=[], proven="",
            )

        monkeypatch.setattr(E.Engine, "search", fake_search)
        out = drive(manager, "SWAP2BOARD", "7,7", "8,8", "9,7", "DONE")
        if expect_swap:
            assert "SWAP" in out
        else:
            moves = [l for l in out
                     if "," in l and not l.startswith(("MESSAGE", "ERROR"))]
            assert len(moves) == 1 and len(moves[0].split()) == 1


def test_solver_budget_tuner_brackets():
    """SolverBudgetTuner (reference: ThreatSpaceSearch::tune) alternates
    caps, and shifts the bracket up/down once the regression is confident."""
    from alphagomoku_tpu.engine.engine import SolverBudgetTuner

    t = SolverBudgetTuner(cap=128, step=2, cap_max=1024, cap_min=32)
    # larger cap consistently faster -> bracket doubles eventually
    for _ in range(40):
        cap = t.current
        speed = 100.0 if cap == t.lower.param_value else 150.0
        t.record(speed)
        if t.lower.param_value > 128:
            break
    assert t.lower.param_value == 256, t.lower.param_value
    assert t.upper.param_value == 512

    t2 = SolverBudgetTuner(cap=128, step=2, cap_max=1024, cap_min=32)
    # larger cap consistently SLOWER -> bracket halves
    for _ in range(40):
        cap = t2.current
        speed = 150.0 if cap == t2.lower.param_value else 100.0
        t2.record(speed)
        if t2.lower.param_value < 128:
            break
    assert t2.lower.param_value == 64
    # caps stay within [cap_min, cap_max]
    for _ in range(200):
        t2.record(200.0 if t2.current == t2.lower.param_value else 10.0)
    assert t2.lower.param_value >= 32


def test_swap2_first_player_book(manager, tmp_path):
    """At 0 stones the first player places THREE book stones from a random
    row of swap2_openings_file (reference: PUT_FIRST_3_STONES,
    Swap2Controller.cpp:48-60; book format EngineSettings.cpp:29-50)."""
    import json

    book = [[
        {"row": 7, "col": 7, "sign": "CROSS"},
        {"row": 8, "col": 8, "sign": "CIRCLE"},
        {"row": 9, "col": 7, "sign": "CROSS"},
    ]]
    path = tmp_path / "swap2_book.json"
    path.write_text(json.dumps(book))
    drive(manager, "START 15")
    drive(manager, f"INFO swap2_openings_file {path}")
    assert manager.options["swap2_openings_file"] == str(path)
    out = drive(manager, "SWAP2BOARD", "DONE")
    manager.options["swap2_openings_file"] = ""
    answers = [l for l in out if "," in l and not l.startswith(("MESSAGE", "ERROR"))]
    assert len(answers) == 1
    assert answers[0].split() == ["7,7", "8,8", "9,7"], out


def test_swap2_first_player_fallback(manager, monkeypatch):
    """With no book configured, 0 stones falls back to a strong first stone
    plus two balancing stones (three chained searches)."""
    from alphagomoku_tpu.engine import engine as E
    from alphagomoku_tpu.game.types import Move

    manager.options["swap2_openings_file"] = ""
    drive(manager, "START 15")

    def fake_search(self, time_budget=None, selector="best", on_chunk=None,
                    max_sims=None):
        stm = self.sign_to_move()
        taken = {(m.row, m.col) for m in self.moves}
        cell = next((r, c) for r in range(self.rows)
                    for c in range(self.cols) if (r, c) not in taken)
        return E.SearchSummary(
            best_move=Move(row=cell[0], col=cell[1], sign=stm),
            expectation=0.5, win_rate=0.4, draw_rate=0.2,
            simulations=1, nodes=1, time_used=0.0,
            principal_variation=[], proven="",
        )

    monkeypatch.setattr(E.Engine, "search", fake_search)
    out = drive(manager, "SWAP2BOARD", "DONE")
    answers = [l for l in out if "," in l and not l.startswith(("MESSAGE", "ERROR"))]
    assert len(answers) == 1
    assert len(answers[0].split()) == 3, out


def test_swap2_five_stones_swap_or_play(manager, monkeypatch):
    """At 5 stones: expectation < 0.5 answers SWAP, otherwise ONE move
    (reference: EVALUATE_5_STONES, Swap2Controller.cpp:142-155)."""
    from alphagomoku_tpu.engine import engine as E
    from alphagomoku_tpu.game.types import Move

    for expectation, expect_swap in ((0.4, True), (0.6, False)):
        drive(manager, "START 15")

        def fake_search(self, time_budget=None, selector="best", on_chunk=None,
                        max_sims=None, _e=expectation):
            stm = self.sign_to_move()
            taken = {(m.row, m.col) for m in self.moves}
            cell = next((r, c) for r in range(self.rows)
                        for c in range(self.cols) if (r, c) not in taken)
            return E.SearchSummary(
                best_move=Move(row=cell[0], col=cell[1], sign=stm),
                expectation=_e, win_rate=_e, draw_rate=0.0,
                simulations=1, nodes=1, time_used=0.0,
                principal_variation=[], proven="",
            )

        monkeypatch.setattr(E.Engine, "search", fake_search)
        out = drive(manager, "SWAP2BOARD", "7,7", "8,8", "9,7", "10,10",
                    "11,11", "DONE")
        if expect_swap:
            assert "SWAP" in out, out
        else:
            moves = [l for l in out
                     if "," in l and not l.startswith(("MESSAGE", "ERROR"))]
            assert len(moves) == 1 and len(moves[0].split()) == 1, out
