"""Arbitrary-depth fail-low LOSS: solve_loss(levels=2) recursion
(reference: AlphaBetaSearch::recursive_solve proves LOSS wherever its
recursion fails low over a complete move list, at any reached depth,
src/search/alpha_beta/AlphaBetaSearch.cpp:91-135 — VERDICT r4 missing #1).

Soundness discipline mirrors test_loss_fork.py: every batched claim is
cross-verified with the INDEPENDENT host VCT (exact recursion) — and on
9x9 boards the verification is EXHAUSTIVE over every defender reply
(advisor r4: a single-sample completeness check could miss a gap that
mints false LOSS proofs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from alphagomoku_tpu.game.types import CROSS, CIRCLE, NONE, GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.search import vct_batched as VB
from alphagomoku_tpu.search import vct as HostVCT


@pytest.fixture(scope="module")
def tables():
    return V.device_tables(GameRules.FREESTYLE)


# A position (CROSS to move) the direct level-1 prover CANNOT prove lost —
# no single defensive-trigger refutation suffices — but the level-2
# recursion proves: for every defensive option some CIRCLE initiative move
# leaves CROSS in a nested proven loss.  Found by fuzzing; every sampled
# defense was independently refuted by the host VCT at extraction time.
_L2_CROSS = [(2, 4), (6, 0), (7, 4)]
_L2_CIRCLE = [
    (7, 10), (7, 12), (7, 13), (8, 13), (9, 9),
    (11, 8), (11, 12), (12, 8), (12, 9),
]


def _l2_board():
    b = np.zeros((15, 15), np.int8)
    for rc in _L2_CROSS:
        b[rc] = CROSS
    for rc in _L2_CIRCLE:
        b[rc] = CIRCLE
    return b


def test_level2_proves_where_level1_fails(tables):
    b = _l2_board()
    batch = jnp.asarray(b[None])
    stm = jnp.asarray([CROSS], jnp.int8)
    r1 = VB.solve_loss(tables, batch, stm, max_options=8, max_depth=8,
                       max_steps=384, levels=1)
    r2 = VB.solve_loss(tables, batch, stm, max_options=8, max_depth=8,
                       max_steps=384, levels=2)
    assert not bool(np.asarray(r1.loss)[0]), "fixture no longer level-2-only"
    assert bool(np.asarray(r2.loss)[0])
    assert int(np.asarray(r2.distance)[0]) >= 3  # deeper than a bare trigger

    # host cross-check: a sample of CROSS defenses all lose to the exact
    # host VCT recursion
    rng = np.random.default_rng(0)
    empties = [tuple(x) for x in np.argwhere(b == NONE)]
    for i in rng.choice(len(empties), size=6, replace=False):
        r, c = empties[i]
        b2 = b.copy()
        b2[r, c] = CROSS
        res = HostVCT.solve(b2, CIRCLE, GameRules.FREESTYLE,
                            max_depth=16, node_budget=400000)
        assert res.win, (r, c)


def test_level2_subsumes_level1(tables):
    """On a fuzz corpus level-2 must claim a superset of level-1 and keep
    level-1 distances for level-1-proven lanes."""
    rng = np.random.default_rng(5)
    boards = []
    for _ in range(32):
        b = np.zeros((15, 15), np.int8)
        r0, c0 = rng.integers(3, 9, size=2)
        n = rng.integers(5, 10)
        rs = np.clip(r0 + rng.integers(0, 6, size=n), 0, 14)
        cs = np.clip(c0 + rng.integers(0, 6, size=n), 0, 14)
        b[rs, cs] = CIRCLE
        for _ in range(rng.integers(1, 3)):
            r, c = rng.integers(0, 15, size=2)
            if b[r, c] == NONE:
                b[r, c] = CROSS
        boards.append(b)
    batch = jnp.asarray(np.stack(boards))
    stm = jnp.full((len(boards),), CROSS, jnp.int8)
    r1 = VB.solve_loss(tables, batch, stm, max_options=8, levels=1)
    r2 = VB.solve_loss(tables, batch, stm, max_options=8, levels=2)
    l1, l2 = np.asarray(r1.loss), np.asarray(r2.loss)
    assert not (l1 & ~l2).any()
    both = l1 & l2
    assert (np.asarray(r1.distance)[both] == np.asarray(r2.distance)[both]).all()


def test_exhaustive_9x9_soundness(tables):
    """EXHAUSTIVE completeness verification at 9x9 (advisor r4 finding on
    test_loss_fork's single-sample check): for every claimed loss, EVERY
    empty cell — enumerated or not — must be refuted by the independent
    host VCT."""
    h = w = 9
    tables9 = tables  # rule tables are board-size independent
    rng = np.random.default_rng(3)
    boards = []
    for _ in range(24):
        b = np.zeros((h, w), np.int8)
        r0, c0 = rng.integers(2, 6, size=2)
        n = rng.integers(5, 9)
        rs = np.clip(r0 + rng.integers(0, 4, size=n), 0, h - 1)
        cs = np.clip(c0 + rng.integers(0, 4, size=n), 0, w - 1)
        b[rs, cs] = CIRCLE
        for _ in range(rng.integers(1, 3)):
            r, c = rng.integers(0, h, size=2)
            if b[r, c] == NONE:
                b[r, c] = CROSS
        boards.append(b)
    batch = jnp.asarray(np.stack(boards))
    stm = jnp.full((len(boards),), CROSS, jnp.int8)
    res = VB.solve_loss(tables9, batch, stm, max_options=12, levels=2,
                        max_steps=512)
    loss = np.asarray(res.loss)
    assert loss.sum() >= 1, "corpus produced no loss claims"
    checked = 0
    for i in np.where(loss)[0][:3]:  # cap host work; each is exhaustive
        for r, c in [tuple(x) for x in np.argwhere(boards[i] == NONE)]:
            b2 = boards[i].copy()
            b2[r, c] = CROSS
            v = HostVCT.solve(b2, CIRCLE, GameRules.FREESTYLE,
                              max_depth=14, node_budget=200000)
            assert v.win, (i, (r, c), boards[i].tolist())
            checked += 1
    assert checked > 50
