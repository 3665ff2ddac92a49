"""Batched VCT solver tests: lockstep AND-OR proof search parity with the
exact host VCT (reference capability: ThreatSpaceSearch / VCT layer,
src/search/alpha_beta/ThreatSpaceSearch.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import CROSS, CIRCLE, NONE, GameRules
from alphagomoku_tpu.game import board as board_mod
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.search import vct, vct_batched

from tests.test_vct import FORK


def solve_one(txt, stm=CROSS, rules=GameRules.FREESTYLE, **kw):
    board = board_mod.from_string(txt)
    tables = V.device_tables(rules)
    res = vct_batched.solve(tables, jnp.asarray(board[None]),
                            jnp.full(1, stm, jnp.int8), **kw)
    w = board.shape[1]
    mv = int(res.best_move[0])
    return bool(res.win[0]), ((mv // w, mv % w) if mv >= 0 else None)


def test_double_three_fork_win():
    win, mv = solve_one(FORK)
    assert win and mv == (7, 7)


def test_renju_forbidden_fork_no_win():
    win, mv = solve_one(FORK, rules=GameRules.RENJU)
    assert not (win and mv == (7, 7))


def test_quiet_position_no_win():
    txt = "\n".join(["_ " * 15] * 15)
    win, _ = solve_one(txt)
    assert not win


def test_vcf_chain_found():
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
    win, _ = solve_one(txt)
    assert win


def test_defender_counter_three_refutes():
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
    win, _ = solve_one(txt)
    assert not win


def test_immediate_five_reported():
    txt = "X X X X _ " + "_ " * 10 + "\n" + "\n".join(["_ " * 15] * 14)
    win, mv = solve_one(txt)
    assert win and mv == (0, 4)


def test_batch_mixed():
    """Win and no-win boards solved together in one lockstep batch."""
    fork = board_mod.from_string(FORK)
    quiet = np.zeros((15, 15), np.int8)
    boards = jnp.asarray(np.stack([fork, quiet]))
    tables = V.device_tables(GameRules.FREESTYLE)
    res = vct_batched.solve(tables, boards, jnp.full(2, CROSS, jnp.int8))
    assert bool(res.win[0]) and not bool(res.win[1])
    assert int(res.best_move[0]) == 7 * 15 + 7


def _has_five(board):
    for sign in (CROSS, CIRCLE):
        m = (board == sign).astype(np.int32)
        for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
            acc = np.zeros_like(m)
            h, w = board.shape
            for k in range(5):
                sh = np.zeros_like(m)
                r0, c0 = k * dr, k * dc
                rs = slice(max(r0, 0), h + min(r0, 0))
                cs = slice(max(c0, 0), w + min(c0, 0))
                rd = slice(max(-r0, 0), h + min(-r0, 0))
                cd = slice(max(-c0, 0), w + min(-c0, 0))
                sh[rd, cd] = m[rs, cs]
                acc = acc + sh if k else sh
            if (acc >= 5).any():
                return True
    return False


def _random_position(rng, h=11, w=11, stones=14):
    """A quiet-ish random midgame position with balanced stone counts and
    no existing five."""
    while True:
        board = np.zeros((h, w), np.int8)
        cells = rng.choice(h * w, size=stones, replace=False)
        for i, cell in enumerate(cells):
            board[cell // w, cell % w] = CROSS if i % 2 == 0 else CIRCLE
        if not _has_five(board):
            return board


def test_soundness_vs_host_vct():
    """Every batched WIN claim must be confirmed by the exact host VCT run
    with at-least-as-generous budgets (the host defender sets are subsets,
    so a batched proof implies a host proof)."""
    rng = np.random.default_rng(7)
    boards = np.stack([_random_position(rng) for _ in range(48)])
    tables = V.device_tables(GameRules.FREESTYLE)
    for stm in (CROSS, CIRCLE):
        res = vct_batched.solve(
            tables, jnp.asarray(boards), jnp.full(48, stm, jnp.int8),
            max_depth=6, max_steps=256, max_threes=2)
        wins = np.asarray(res.win)
        for i in np.nonzero(wins)[0]:
            host = vct.solve(boards[i].copy(), stm, GameRules.FREESTYLE,
                             max_depth=10, node_budget=200000,
                             max_defenses=24, max_threes=2)
            assert host.win, f"batched claimed unsound win on board {i} stm {stm}"


def test_soundness_clustered():
    """Denser center-biased positions (high VCT hit-rate, ~half the boards
    prove a win) — every claim re-proven by the exact host solver."""
    rng = np.random.default_rng(3)
    boards = []
    while len(boards) < 32:
        b = np.zeros((11, 11), np.int8)
        for i in range(16):
            r, c = rng.integers(3, 8), rng.integers(3, 8)
            if b[r, c] == NONE:
                b[r, c] = CROSS if i % 2 == 0 else CIRCLE
        if not _has_five(b):
            boards.append(b)
    boards = np.stack(boards)
    tables = V.device_tables(GameRules.FREESTYLE)
    res = vct_batched.solve(
        tables, jnp.asarray(boards), jnp.full(32, CROSS, jnp.int8),
        max_depth=6, max_steps=256, max_threes=2)
    wins = np.asarray(res.win)
    assert wins.sum() >= 8, "expected a tactically rich sample"
    for i in np.nonzero(wins)[0]:
        host = vct.solve(boards[i].copy(), CROSS, GameRules.FREESTYLE,
                         max_depth=10, node_budget=200000,
                         max_defenses=24, max_threes=2)
        assert host.win, f"batched claimed unsound win on board {i}"


def test_renju_soundness_black():
    """Renju black VCT claims must be confirmed by the exact host solver
    (forbidden-move handling is the risky part)."""
    rng = np.random.default_rng(11)
    boards = np.stack([_random_position(rng, stones=16) for _ in range(24)])
    tables = V.device_tables(GameRules.RENJU)
    res = vct_batched.solve(
        tables, jnp.asarray(boards), jnp.full(len(boards), CROSS, jnp.int8),
        max_depth=6, max_steps=256, max_threes=2)
    wins = np.asarray(res.win)
    for i in np.nonzero(wins)[0]:
        host = vct.solve(boards[i].copy(), CROSS, GameRules.RENJU,
                         max_depth=10, node_budget=200000,
                         max_defenses=24, max_threes=2)
        assert host.win, f"batched renju claimed unsound win on board {i}"
