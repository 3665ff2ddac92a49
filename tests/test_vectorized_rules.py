"""Cross-check the batched JAX rules engine against the exact host engine.

Random lockstep rollouts with a shared fixed RNG: every board, every step,
both engines must agree on outcome, and (for renju) on the full forbidden
plane.  The host engine is itself validated against the reference's golden
fixtures + bit-exact tables, so agreement here closes the parity chain.
"""

import numpy as np
import pytest

from alphagomoku_tpu.game import rules as host_rules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.game.types import CROSS, CIRCLE, NONE, GameOutcome, GameRules, Move

BATCH = 48
SIZE = 15
MAX_STEPS = 60


def _random_rollout_moves(rng, boards_done, host_boards):
    """Pick one random empty cell per board (host-side, shared stream)."""
    rows, cols = [], []
    for i in range(len(host_boards)):
        empties = np.argwhere(host_boards[i] == NONE)
        if len(empties) == 0 or boards_done[i]:
            rows.append(0)
            cols.append(0)
            continue
        r, c = empties[rng.integers(len(empties))]
        rows.append(int(r))
        cols.append(int(c))
    return np.array(rows), np.array(cols)


@pytest.mark.parametrize("rules", list(GameRules), ids=[r.name for r in GameRules])
def test_rollout_parity(rules):
    rng = np.random.default_rng(1234 + int(rules))
    tables = V.device_tables(rules)
    state = V.env_reset(BATCH, SIZE, SIZE)

    host_boards = np.zeros((BATCH, SIZE, SIZE), np.int8)
    host_outcome = np.full(BATCH, int(GameOutcome.UNKNOWN), np.int8)
    host_to_move = np.full(BATCH, CROSS, np.int8)

    import jax

    step = jax.jit(lambda s, r, c: V.env_step(tables, s, r, c))

    for step_i in range(MAX_STEPS):
        done = host_outcome != int(GameOutcome.UNKNOWN)
        if done.all():
            break
        rows, cols = _random_rollout_moves(rng, done, host_boards)
        state = step(state, rows, cols)

        # host engine applies the same moves
        for i in range(BATCH):
            if done[i]:
                continue
            sign = int(host_to_move[i])
            host_boards[i, rows[i], cols[i]] = sign
            out = host_rules.get_outcome(
                rules, host_boards[i], Move(int(rows[i]), int(cols[i]), sign)
            )
            host_outcome[i] = int(out)
            host_to_move[i] = CIRCLE if sign == CROSS else CROSS

        np.testing.assert_array_equal(
            np.asarray(state.outcome), host_outcome, err_msg=f"step {step_i}"
        )
        np.testing.assert_array_equal(np.asarray(state.board), host_boards)
        np.testing.assert_array_equal(np.asarray(state.to_move), host_to_move)


def test_forbidden_plane_parity():
    """Renju forbidden plane vs exact host recursion on semi-random boards
    seeded with clustered stones (forks are rare in uniform noise)."""
    rng = np.random.default_rng(7)
    tables = V.device_tables(GameRules.RENJU)
    boards = np.zeros((32, SIZE, SIZE), np.int8)
    for i in range(32):
        # random walk cluster to generate pattern-rich positions
        n_stones = rng.integers(8, 30)
        r, c = SIZE // 2, SIZE // 2
        for s in range(n_stones):
            boards[i, r, c] = CROSS if s % 3 != 2 else CIRCLE  # black-heavy
            r = int(np.clip(r + rng.integers(-2, 3), 0, SIZE - 1))
            c = int(np.clip(c + rng.integers(-2, 3), 0, SIZE - 1))

    plane = np.asarray(V.forbidden_plane(tables, boards))
    for i in range(32):
        for r in range(SIZE):
            for c in range(SIZE):
                if boards[i, r, c] != NONE:
                    assert not plane[i, r, c]
                    continue
                want = host_rules.is_forbidden(boards[i], Move(r, c, CROSS))
                assert plane[i, r, c] == want, (i, r, c, want)


def test_forbidden_plane_overflow_is_conservative():
    """The fork resolution compacts fork cells globally across the batch
    (cap 128).  Past the cap, cells keep the naive answer, which may only
    err toward 'forbidden' — never mark a truly forbidden cell as playable.
    Duplicating one fork-rich board many times forces the overflow."""
    rng = np.random.default_rng(11)
    tables = V.device_tables(GameRules.RENJU)
    base = np.zeros((SIZE, SIZE), np.int8)
    r, c = SIZE // 2, SIZE // 2
    for s in range(40):
        base[r, c] = CROSS if s % 3 != 2 else CIRCLE
        r = int(np.clip(r + rng.integers(-2, 3), 0, SIZE - 1))
        c = int(np.clip(c + rng.integers(-2, 3), 0, SIZE - 1))
    boards = np.broadcast_to(base, (256, SIZE, SIZE)).copy()

    plane = np.asarray(V.forbidden_plane(tables, boards))
    exact = np.zeros((SIZE, SIZE), bool)
    for rr in range(SIZE):
        for cc in range(SIZE):
            if base[rr, cc] == NONE:
                exact[rr, cc] = host_rules.is_forbidden(base, Move(rr, cc, CROSS))
    # soundness on every row: batched-forbidden is a superset of exact
    assert (plane & ~exact[None]).sum() >= 0  # trivially true, kept for clarity
    assert not (exact[None] & ~plane).any(), "a forbidden cell was marked playable"
    # rows whose fork cells fit inside the cap must be exact; with one
    # identical board the first rows' forks are selected first, so row 0
    # is exact whenever the board has <= 128 fork cells (it does)
    assert (plane[0] == exact).all()


def test_windows_at_matches_host():
    rng = np.random.default_rng(3)
    boards = rng.integers(0, 3, size=(8, SIZE, SIZE)).astype(np.int8)
    rows = rng.integers(0, SIZE, size=8)
    cols = rng.integers(0, SIZE, size=8)
    wins = np.asarray(V.windows_at(boards, rows, cols))
    for i in range(8):
        for d in range(4):
            want = host_rules.get_window(boards[i], int(rows[i]), int(cols[i]), d)
            assert wins[i, d] == want
