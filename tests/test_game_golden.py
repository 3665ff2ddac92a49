"""Replay the reference's golden game-rule fixtures against the host engine.

Fixtures are extracted verbatim from reference test/game/*.cpp by
tools/extract_game_fixtures.py (boards + assertions are data; the engine
implementation under test is ours).
"""

import json
import os

import pytest

from alphagomoku_tpu.game import board as board_mod
from alphagomoku_tpu.game.rules import get_outcome, is_forbidden
from alphagomoku_tpu.game.types import GameOutcome, GameRules, Move

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "game_golden.json")

with open(FIXTURES) as fh:
    _FIXTURES = json.load(fh)


@pytest.mark.parametrize("fixture", _FIXTURES, ids=[f["name"] for f in _FIXTURES])
def test_golden(fixture):
    board = None
    for op in fixture["ops"]:
        kind = op[0]
        if kind == "board":
            board = board_mod.from_string(op[1])
        elif kind == "add":
            board_mod.put_move(board, Move.from_text(op[1]))
        elif kind == "undo":
            board_mod.undo_move(board, Move.from_text(op[1]))
        elif kind == "outcome":
            rules = GameRules.from_string(op[1])
            move = Move.from_text(op[2])
            expected = GameOutcome.from_string(op[3])
            got = get_outcome(rules, board, move)
            assert got == expected, f"{op}: got {got.name}"
        elif kind == "forbidden":
            move = Move.from_text(op[1])
            got = is_forbidden(board, move)
            assert got == op[2], f"{op}: got {got}"
        else:
            raise ValueError(kind)
