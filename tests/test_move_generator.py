"""Replay the reference's move-generator golden suite against the staged
host move generator (reference: test/search/alpha_beta/test_move_generator.cpp
via tools/extract_solver_fixtures.py)."""

import json
import os

import pytest

from alphagomoku_tpu.game.board import from_string
from alphagomoku_tpu.game.types import Move, GameRules, CROSS, CIRCLE
from alphagomoku_tpu.search import move_generator as MG

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "solver_golden.json")

with open(FIXTURES) as fh:
    _CASES = json.load(fh)

_SIGNS = {"CROSS": CROSS, "CIRCLE": CIRCLE}
_SCORES = {"win_in": MG.win_in, "loss_in": MG.loss_in, "draw_in": MG.draw_in}


@pytest.mark.parametrize("case", _CASES, ids=[c["name"] for c in _CASES])
def test_golden(case):
    board = from_string(case["board"])
    results = []
    for run in case["runs"]:
        actions, _ = MG.generate(
            board,
            _SIGNS[run["stm"]],
            GameRules[run["rules"]],
            mode=run["mode"],
        )
        results.append(actions)
        for a in run["asserts"]:
            kind = a[0]
            if kind == "must_defend":
                assert actions.must_defend == a[1], f"must_defend != {a[1]}"
            elif kind == "has_initiative":
                assert actions.has_initiative == a[1], f"has_initiative != {a[1]}"
            elif kind == "size":
                got = len(actions)
                if a[1] == "eq":
                    assert got == a[2], f"size {got} != {a[2]}: {actions.locations()}"
                else:
                    assert got >= a[2], f"size {got} < {a[2]}"
            elif kind == "contains":
                mv = Move.from_text(a[2])
                assert actions.contains((mv.row, mv.col)) == a[1], (
                    f"contains({a[2]}) != {a[1]}: {actions.locations()}"
                )
            elif kind == "score_of":
                mv = Move.from_text(a[1])
                want = _SCORES[a[2]](a[3])
                got = actions.score_of((mv.row, mv.col))
                assert got == want, f"score_of({a[1]}) = {got:#x} != {want:#x}"
            elif kind == "equals":
                other = results[a[1]]
                assert actions.moves.keys() == other.moves.keys()
            else:  # pragma: no cover
                raise AssertionError(f"unknown assert {a}")
