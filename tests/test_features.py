"""Symmetry + NN-input-feature tests.

The equivariance test mirrors the reference's intent for
NNInputFeatures::augment (direction-dependent bits must be shuffled along
with the spatial transform, reference: src/networks/NNInputFeatures.cpp:111-155
and test/networks/test_NNInputFeatures.cpp): encoding a transformed board
must equal transforming the encoded features.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from alphagomoku_tpu.game.types import NONE, CROSS, CIRCLE, GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.patterns import features as F
from alphagomoku_tpu.utils import augment


def random_boards(rng, batch, size=15, stones=40):
    boards = np.zeros((batch, size, size), np.int8)
    for b in range(batch):
        n = rng.integers(0, stones)
        cells = rng.choice(size * size, size=n, replace=False)
        signs = np.where(np.arange(n) % 2 == 0, CROSS, CIRCLE)
        boards[b].flat[cells] = signs
    return boards


@pytest.mark.parametrize("mode", range(8))
def test_symmetry_roundtrip(mode):
    rng = np.random.default_rng(mode)
    x = rng.integers(0, 1000, size=(3, 9, 9))
    y = augment.apply_symmetry(x, mode)
    z = augment.inverse_symmetry(y, mode)
    np.testing.assert_array_equal(np.asarray(z), x)


@pytest.mark.parametrize("mode", range(8))
def test_symmetry_location(mode):
    rng = np.random.default_rng(100 + mode)
    x = rng.integers(0, 1000, size=(11, 11))
    y = np.asarray(augment.apply_symmetry(x, mode))
    for r, c in [(0, 0), (3, 7), (10, 2), (5, 5)]:
        rr, cc = augment.symmetry_location(r, c, 11, 11, mode)
        assert y[int(rr), int(cc)] == x[r, c]


def test_symmetry_group_closure():
    """Applying a symmetry then its inverse via the dynamic (traced) path."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(0, 99, size=(8, 9, 9)))
    modes = jnp.arange(8)
    y = augment.apply_symmetry_batch(x, modes)
    z = augment.inverse_symmetry_batch(y, modes)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))


def test_feature_bits_basic():
    tables = V.device_tables(GameRules.FREESTYLE)
    board = np.zeros((1, 15, 15), np.int8)
    # cross row of 4 with open ends at (7, 3..6)
    board[0, 7, 3:7] = CROSS
    board[0, 3, 3] = CIRCLE
    packed = np.asarray(F.encode(tables, jnp.asarray(board), jnp.asarray([CROSS])))

    legal = packed & 1
    assert legal[0, 0, 0] == 1 and legal[0, 7, 3] == 0 and legal[0, 3, 3] == 0
    own = (packed >> 1) & 1
    opp = (packed >> 2) & 1
    assert own[0, 7, 4] == 1 and opp[0, 3, 3] == 1
    assert ((packed >> 3) & 1).all()  # ones plane
    assert ((packed >> 4) & 1).all()  # cross to move
    assert not ((packed >> 5) & 1).any()
    assert not ((packed >> 7) & 1).any()  # zeros plane

    # (7,2) and (7,7) complete an open five for cross: own five bit (18)
    assert (packed[0, 7, 2] >> 18) & 1 == 1
    assert (packed[0, 7, 7] >> 18) & 1 == 1
    # and nothing marks an opponent five
    assert not ((packed >> 30) & 1).any()


def test_feature_side_to_move_swap():
    """Swapping side-to-move swaps the own/opponent groups."""
    rng = np.random.default_rng(3)
    tables = V.device_tables(GameRules.STANDARD)
    boards = jnp.asarray(random_boards(rng, 4))
    a = np.asarray(F.encode(tables, boards, jnp.full(4, CROSS, jnp.int8)))
    b = np.asarray(F.encode(tables, boards, jnp.full(4, CIRCLE, jnp.int8)))
    # stones swap between bits 1 and 2
    np.testing.assert_array_equal((a >> 1) & 1, (b >> 2) & 1)
    np.testing.assert_array_equal((a >> 2) & 1, (b >> 1) & 1)
    # pattern groups swap between bits 8-19 and 20-31
    np.testing.assert_array_equal((a >> 8) & 0xFFF, (b >> 20) & 0xFFF)
    np.testing.assert_array_equal((a >> 20) & 0xFFF, (b >> 8) & 0xFFF)


_EQUIV_CASES = [(GameRules.FREESTYLE, m) for m in range(8)] + [
    # renju compiles the forbidden-plane recursion per mode — cover one mode
    # from each direction-permutation class to bound compile time
    (GameRules.RENJU, 1),
    (GameRules.RENJU, 4),
    (GameRules.RENJU, 6),
]


@pytest.mark.parametrize("rules,mode", _EQUIV_CASES)
def test_feature_augment_equivariance(rules, mode):
    """encode(sym(board)) == augment(encode(board), sym) for all 8 modes."""
    rng = np.random.default_rng(42 + mode)
    tables = V.device_tables(rules)
    boards = jnp.asarray(random_boards(rng, 4, stones=60))
    signs = jnp.asarray(
        np.where(np.arange(4) % 2 == 0, CROSS, CIRCLE).astype(np.int8)
    )
    direct = F.encode(tables, augment.apply_symmetry(boards, mode), signs)
    via_aug = F.augment_features(F.encode(tables, boards, signs), mode)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(via_aug))


def test_unpack_planes():
    rng = np.random.default_rng(1)
    packed = jnp.asarray(rng.integers(0, 2**32, size=(2, 5, 5), dtype=np.uint32))
    planes = np.asarray(F.unpack_planes(packed, jnp.float32))
    assert planes.shape == (2, 5, 5, 32)
    recon = (planes.astype(np.uint64) * (1 << np.arange(32, dtype=np.uint64))).sum(-1)
    np.testing.assert_array_equal(recon.astype(np.uint32), np.asarray(packed))
