"""Batched VCF solver tests: forced-win detection on tactical positions
(reference coverage model: test/search alpha-beta solver goldens)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import CROSS, CIRCLE, GameRules
from alphagomoku_tpu.game import board as board_mod
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.search import vcf

H = W = 15


@pytest.fixture(scope="module")
def tables():
    return V.device_tables(GameRules.FREESTYLE)


def run(tables, txt, stm=CROSS, depth=8, steps=128):
    boards = board_mod.from_string(txt)[None]
    f = jax.jit(
        lambda b: vcf.solve(tables, b, jnp.full((1,), stm, jnp.int8), depth, steps)
    )
    res = f(jnp.asarray(boards))
    return (
        bool(np.asarray(res.win)[0]),
        int(np.asarray(res.best_move)[0]),
        int(np.asarray(res.distance)[0]),
    )


def test_win_in_one(tables):
    txt = """
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ O X X X X _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ O _ _ _ _ _ _ _ _ _ _ _
    _ _ _ O _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    """
    win, move, dist = run(tables, txt)
    assert win and dist == 1
    assert (move // W, move % W) == (7, 7)


def test_vcf_depth_two(tables):
    """Half-open four forces the block, then the diagonal open four wins:
    X(7,3..7,5) + O(7,2); diagonal X(5,4),(6,5).  Line: X(7,6) -> O(7,7)
    forced -> X(4,3) open four -> mate."""
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
    _ O _ _ _ _ _ _ _ _ _ _ _ _ _
    _ O _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    """
    win, move, dist = run(tables, txt)
    assert win, "VCF should find the forcing win"
    assert dist >= 3
    r, c = move // W, move % W
    # any first move of a genuine VCF line is acceptable; the canonical one
    # is (7,6) making the horizontal four
    assert (r, c) in [(7, 6), (4, 3), (7, 1)], f"got {(r, c)}"


def test_no_vcf(tables):
    txt = """
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ O X X _ _ _ _ _ _ _ _ _
    _ _ _ _ _ O _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    """
    win, move, dist = run(tables, txt)
    assert not win and move == -1 and dist == 0


def test_opponent_five_blocks_vcf(tables):
    """The opponent threatens a five: attacker fours that do not block are
    rejected, so no VCF (the attacker's four is elsewhere)."""
    txt = """
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ O O O O _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ O X X X _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    _ _ _ _ _ _ _ _ _ _ _ _ _ _ _
    """
    win, move, dist = run(tables, txt)
    assert not win  # circle's open four cannot be out-raced by the fours


def test_batched_mixed(tables):
    """Multiple boards with different outcomes solved in one lockstep call."""
    win1 = np.zeros((H, W), np.int8)
    win1[7, 3:7] = CROSS
    win1[9, 3] = CIRCLE
    win1[9, 4] = CIRCLE
    nowin = np.zeros((H, W), np.int8)
    nowin[7, 3] = CROSS
    nowin[8, 3] = CIRCLE
    boards = jnp.asarray(np.stack([win1, nowin]))
    res = jax.jit(
        lambda b: vcf.solve(
            tables, b, jnp.full((2,), CROSS, jnp.int8), 6, 64
        )
    )(boards)
    w = np.asarray(res.win)
    assert bool(w[0]) and not bool(w[1])
