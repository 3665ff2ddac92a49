"""Deeper LOSS proving: the fork-4x3 trigger (batched defend_loss_in_6,
reference: src/search/alpha_beta/MoveGenerator.cpp:423-447 + the fail-low
loss leg of AlphaBetaSearch.cpp:91-135).

Soundness is the load-bearing property: every claimed loss is
cross-verified with the INDEPENDENT host VCT (search/vct.py exact
recursion) — after each enumerated defensive option the attacker must have
a provable win; and a sampled non-enumerated defender move must also lose
(set-completeness spot check)."""

import numpy as np
import pytest

import jax.numpy as jnp

from alphagomoku_tpu.game.types import CROSS, CIRCLE, NONE, GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.search import vct_batched as VB
from alphagomoku_tpu.search import vct as HostVCT

H = W = 15


@pytest.fixture(scope="module")
def tables():
    return V.device_tables(GameRules.FREESTYLE)


def fork43_board():
    """CIRCLE (attacker, not to move) holds a 4x3 fork at (7,7):
    horizontally X O O O [f] makes a half-open four, vertically two stones
    below make an open three.  CROSS to move must defend."""
    b = np.zeros((H, W), np.int8)
    b[7, 3] = CROSS
    b[7, 4] = b[7, 5] = b[7, 6] = CIRCLE
    b[5, 7] = b[6, 7] = CIRCLE
    b[0, 0] = b[0, 14] = CROSS  # far-away defender stones (no threats)
    return b


def test_fork43_trigger_enumerates(tables):
    """The fork trigger fires on the constructed position: provable with a
    complete option set containing the fork cell and the line defenses."""
    b = fork43_board()
    prep = VB.prepare_loss(
        tables, jnp.asarray(b[None]), jnp.asarray([CROSS], jnp.int8),
        max_options=24,
    )
    assert not bool(np.asarray(prep.five_case)[0])
    assert int(np.asarray(prep.base)[0]) == 5  # fork execution = 5 plies
    assert bool(np.asarray(prep.provable)[0])
    n = int(np.asarray(prep.n_opts)[0])
    assert 1 <= n <= 24
    # the fork cell itself must be among the options
    valid = np.asarray(prep.valid)[0]
    child = np.asarray(prep.child_board).reshape(1, 24, H, W)[0]
    placed = [tuple(np.argwhere(child[m] != b)[0]) for m in range(24) if valid[m]]
    assert (7, 7) in placed


def test_fork43_claims_are_sound_vs_host_vct(tables):
    """Fuzz fork-dense positions; every batched loss claim must be backed by
    the host VCT proving an attacker win after EVERY enumerated option and
    after a sampled non-enumerated move."""
    rng = np.random.default_rng(5)
    M = 16
    boards = []
    for _ in range(48):
        b = np.zeros((H, W), np.int8)
        r0, c0 = rng.integers(3, 9, size=2)
        n = rng.integers(5, 10)
        rs = np.clip(r0 + rng.integers(0, 6, size=n), 0, H - 1)
        cs = np.clip(c0 + rng.integers(0, 6, size=n), 0, W - 1)
        b[rs, cs] = CIRCLE  # attacker-heavy cluster
        for _ in range(rng.integers(1, 3)):
            r, c = rng.integers(0, H, size=2)
            if b[r, c] == NONE:
                b[r, c] = CROSS
        boards.append(b)
    batch = jnp.asarray(np.stack(boards))
    stm = jnp.full((len(boards),), CROSS, jnp.int8)
    res = VB.solve_loss(tables, batch, stm, max_options=M, max_depth=8,
                        max_steps=512, max_threes=2)
    prep = VB.prepare_loss(tables, batch, stm, max_options=M)
    loss = np.asarray(res.loss)
    claimed = int(loss.sum())
    valid = np.asarray(prep.valid)
    child = np.asarray(prep.child_board).reshape(len(boards), M, H, W)
    checked = 0
    for i in np.where(loss)[0]:
        for m in range(M):
            if not valid[i, m]:
                continue
            win = HostVCT.solve(child[i, m], CIRCLE, GameRules.FREESTYLE,
                                max_depth=10, node_budget=60000).win
            assert win, (i, m, boards[i].tolist())
            checked += 1
        # completeness spot check: one random NON-enumerated empty cell must
        # also lose (host VCT wins after it)
        opts_cells = {
            tuple(np.argwhere(child[i, m] != boards[i])[0])
            for m in range(M) if valid[i, m]
        }
        empties = [tuple(x) for x in np.argwhere(boards[i] == NONE)
                   if tuple(x) not in opts_cells]
        if empties:
            r, c = empties[rng.integers(len(empties))]
            b2 = boards[i].copy()
            b2[r, c] = CROSS
            win = HostVCT.solve(b2, CIRCLE, GameRules.FREESTYLE,
                                max_depth=10, node_budget=60000).win
            assert win, (i, (r, c), boards[i].tolist())
    # the trigger must be non-vacuous over the corpus
    assert claimed >= 1, "no fork-4x3 loss claims fired on the fuzz corpus"
    assert checked >= 1
