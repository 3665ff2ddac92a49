"""Host VCT solver tests: forced wins via continuous threats incl. open
threes (reference capability: ThreatSpaceSearch / VCT layer)."""

import numpy as np
import pytest

from alphagomoku_tpu.game.types import CROSS, CIRCLE, GameRules
from alphagomoku_tpu.game import board as board_mod
from alphagomoku_tpu.search import vct


def run(txt, stm=CROSS, rules=GameRules.FREESTYLE, **kw):
    return vct.solve(board_mod.from_string(txt), stm, rules, **kw)


FORK = """
_ _ _ _ _ _ _ _ _ _ _ _ _ _ _
_ _ _ _ _ _ _ _ _ _ _ _ _ _ _
_ _ _ _ _ _ _ _ _ _ _ _ _ _ _
_ _ _ _ _ _ _ _ _ _ _ _ _ _ _
_ _ _ _ _ _ _ _ _ _ _ _ _ _ _
_ _ _ _ _ _ _ X _ _ _ _ _ _ _
_ _ _ _ _ _ _ X _ _ _ _ _ _ _
_ _ _ _ _ X X _ _ _ _ _ _ _ _
_ _ _ _ _ _ _ _ _ _ _ _ _ _ _
_ _ _ O _ _ _ _ _ _ _ _ _ _ _
_ _ _ _ _ O _ _ _ _ _ _ _ _ _
_ _ _ O _ _ _ _ _ _ _ _ _ _ _
_ _ _ _ _ O _ _ _ _ _ _ _ _ _
_ _ _ _ _ _ _ _ _ _ _ _ _ _ _
_ _ _ _ _ _ _ _ _ _ _ _ _ _ _
"""


def test_double_three_fork_win():
    """(7,7) creates two open threes; no single defense stops both — a VCT
    win a pure VCF (fours-only) search cannot find."""
    res = run(FORK)
    assert res.win and res.best_move == (7, 7), res


def test_renju_forbidden_fork_is_no_win():
    """The same fork cell is a forbidden 3x3 for black under renju."""
    res = run(FORK, rules=GameRules.RENJU)
    assert not (res.win and res.best_move == (7, 7))


def test_quiet_position_no_win():
    txt = """
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ X X _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ O _ _ _ _ _ _
    _ _ _ _ _ _ _ _ O _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    """
    assert not run(txt).win


def test_vcf_chain_still_found():
    """Pure four chains (VCF subset) must still be proven."""
    txt = """
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ X _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ X _ _ _ _ _ _ _ _ _
    _ _ O X X X _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ O _ _ _ _ _ _ _ _ _ _ _ _ _
    _ O _ _ O _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    """
    assert run(txt).win


def test_defender_open_three_counter_refutes():
    """When the defender holds an open-three counter (their counter-four
    becomes an open four), the attack line is correctly rejected."""
    txt = """
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ X _ _ _ _ _ _ _
    _ _ _ _ _ _ _ X _ _ _ _ _ _ _
    _ _ _ _ _ X X _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ O _ _ _ _ _ _ _ _ _ _ _
    _ _ _ O _ _ _ _ _ _ _ _ _ _ _
    _ _ _ O _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    """
    res = run(txt)
    assert not res.win  # O's vertical open three out-races the fork
