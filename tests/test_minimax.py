"""Host validation minimax (search/minimax.py) vs known tactical results
and the batched solvers (reference scaffold: MinimaxSearch.cpp)."""

import numpy as np
import jax.numpy as jnp

from alphagomoku_tpu.game.types import CROSS, CIRCLE, GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.search import minimax as MM
from alphagomoku_tpu.search import move_generator as MG
from alphagomoku_tpu.search import vct_batched as VB

H = W = 15


def test_win_in_1_and_3():
    b = np.zeros((H, W), np.int8)
    b[7, 3:7] = CROSS  # four in a row, open at (7,7) and (7,2)
    s, acts = MM.solve(b, CROSS, GameRules.FREESTYLE, depth=2)
    assert s == MG.win_in(1)
    assert acts[(7, 7)] == MG.win_in(1) or acts[(7, 2)] == MG.win_in(1)

    b2 = np.zeros((H, W), np.int8)
    b2[7, 4:7] = CROSS  # open three -> open four -> win in 3
    b2[0, 0] = b2[0, 14] = CIRCLE
    s2, _ = MM.solve(b2, CROSS, GameRules.FREESTYLE, depth=4)
    assert s2 == MG.win_in(3), hex(s2)


def test_double_three_win_in_5():
    """A double-open-three fork wins in 5 plies — beyond the static stages,
    provable only by the recursion."""
    b = np.zeros((H, W), np.int8)
    b[5, 7] = b[6, 7] = CROSS  # vertical pair
    b[7, 5] = b[7, 6] = CROSS  # horizontal pair
    b[0, 0] = b[0, 14] = b[14, 0] = CIRCLE
    s, acts = MM.solve(b, CROSS, GameRules.FREESTYLE, depth=6)
    assert MG.is_win(s), hex(s)
    assert s == MG.win_in(5), hex(s)
    assert MG.is_win(acts[(7, 7)])  # the fork cell


def test_minimax_agrees_with_batched_vct():
    """On random tactical boards every batched VCT win claim is confirmed
    by the (independent) minimax at matching depth."""
    tables = V.device_tables(GameRules.FREESTYLE)
    rng = np.random.default_rng(9)
    boards = []
    for _ in range(24):
        b = np.zeros((H, W), np.int8)
        r0, c0 = rng.integers(4, 9, size=2)
        n = rng.integers(4, 9)
        rs = np.clip(r0 + rng.integers(0, 5, size=n), 0, H - 1)
        cs = np.clip(c0 + rng.integers(0, 5, size=n), 0, W - 1)
        b[rs, cs] = CROSS
        for _ in range(rng.integers(0, 2)):
            r, c = rng.integers(0, H, size=2)
            if b[r, c] == 0:
                b[r, c] = CIRCLE
        boards.append(b)
    batch = jnp.asarray(np.stack(boards))
    stm = jnp.full((len(boards),), CROSS, jnp.int8)
    res = VB.solve(tables, batch, stm, max_depth=6, max_steps=256)
    win = np.asarray(res.win)
    dist = np.asarray(res.distance)
    confirmed = 0
    for i in np.where(win)[0]:
        s, _ = MM.solve(boards[i], CROSS, GameRules.FREESTYLE,
                        depth=int(dist[i]) + 1, mode="threats")
        assert MG.is_win(s), (i, hex(s), int(dist[i]))
        confirmed += 1
    assert confirmed >= 1  # corpus must exercise the cross-check


def test_alpha_beta_iterative_deepening():
    """solve_ab (AlphaBetaSearch twin): proves the tactical wins the plain
    minimax proves, and its depth-0 evaluation matches the reference's
    threat-histogram constants."""
    from alphagomoku_tpu.search.minimax import solve_ab, evaluate

    b = np.zeros((H, W), np.int8)
    b[7, 4:7] = CROSS  # open three -> win in 3
    b[0, 0] = b[0, 14] = CIRCLE
    s, acts = solve_ab(b, CROSS, GameRules.FREESTYLE, max_depth=8)
    assert s == MG.win_in(3), hex(s)

    # double-three fork -> win in 5 through the deepening
    b2 = np.zeros((H, W), np.int8)
    b2[5, 7] = b2[6, 7] = CROSS
    b2[7, 5] = b2[7, 6] = CROSS
    b2[0, 0] = b2[0, 14] = b2[14, 0] = CIRCLE
    s2, _ = solve_ab(b2, CROSS, GameRules.FREESTYLE, max_depth=8)
    assert s2 == MG.win_in(5), hex(s2)

    # evaluation: one cross open three on an otherwise quiet board gives
    # 12 + 2*19 (two OPEN_3 completion spots) + opponent-view contributions
    b3 = np.zeros((H, W), np.int8)
    b3[7, 4:7] = CROSS
    ev_cross = evaluate(b3, CROSS, GameRules.FREESTYLE)
    ev_circle = evaluate(b3, CIRCLE, GameRules.FREESTYLE)
    # cross to move: own open-three spots score positive; circle to move
    # sees them as opponent threats and scores negative
    assert (ev_cross & 8191) - 4000 > 0
    assert (ev_circle & 8191) - 4000 < 0


def test_deepening_proves_forcing_four_ladder():
    """A win reachable only through RECURSION: the root has no statically
    scored win (no four, no fork) — the gain appears after a forced block.
    (7,7) makes a four (forced block at (7,8)) and only a HALF-open diag
    three; the follow-up (8,8) then makes the diag four plus an open three
    on row 8 — a 4x3 fork two forcing plies deep.  The advisor's r4 finding
    was that solve_ab's deepening loop broke out at depth 0 and could never
    prove such positions; this pins the fix for both solvers."""
    from alphagomoku_tpu.search.minimax import solve, solve_ab

    b = np.zeros((H, W), np.int8)
    b[7, 4:7] = CROSS
    b[7, 3] = CIRCLE                              # half-open three, row 7
    b[5, 5] = b[6, 6] = CROSS
    b[4, 4] = CIRCLE                              # diag blocked far end
    b[8, 10] = b[8, 11] = CROSS                   # row-8 broken-three stuff
    for rc in [(0, 0), (0, 14), (14, 0), (14, 14), (0, 7)]:
        b[rc] = CIRCLE

    # root is NOT statically proven (would defeat the purpose of the test)
    acts, s0 = MG.generate(b, CROSS, GameRules.FREESTYLE, mode="optimal")
    assert not MG.is_proven(s0), hex(s0)
    assert not MG.is_win(acts.moves[(7, 7)])

    s, _ = solve(b, CROSS, GameRules.FREESTYLE, depth=6)
    assert MG.is_win(s), hex(s)
    sab, root = solve_ab(b, CROSS, GameRules.FREESTYLE, max_depth=8)
    assert MG.is_win(sab), hex(sab)
    assert MG.is_win(root[(7, 7)])
