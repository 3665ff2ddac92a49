"""Bitwise classifier must be bit-identical to the table path over ALL
4^10 center-free windows, for every rule variant."""

import numpy as np
import jax.numpy as jnp
import pytest

from alphagomoku_tpu.game.types import GameRules
from alphagomoku_tpu.patterns import bitwise
from alphagomoku_tpu.patterns import tables as T


@pytest.mark.parametrize("rules", list(GameRules))
def test_full_table_parity(rules):
    pattern_table, _ = T.get_tables(rules)
    keys = np.arange(T.NUM_PATTERNS, dtype=np.uint32)
    windows = T.expand(keys)  # 22-bit windows with empty center
    packed = np.asarray(bitwise.classify_packed(jnp.asarray(windows), rules))
    np.testing.assert_array_equal(packed.astype(np.uint8), pattern_table)
