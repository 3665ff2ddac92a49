"""Pattern/threat table content regression tests.

The pinned hashes were verified bit-for-bit against the reference engine's
tables (PatternTable/ThreatTable built by a throwaway dump tool compiled
against reference headers; see tools/extract_game_fixtures.py docstring for
the fixture philosophy).  Only valid windows are hashed: windows where a
board cell follows ILLEGAL padding cannot occur and the reference leaves them
unclassified.
"""

import hashlib
import json
import os

import numpy as np
import pytest

from alphagomoku_tpu.game.types import GameRules
from alphagomoku_tpu.patterns.tables import (
    NUM_PATTERNS,
    expand,
    get_tables,
    narrow_down,
    open_three_promotion_moves,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "table_hashes.json")


def _valid_mask() -> np.ndarray:
    keys = np.arange(NUM_PATTERNS, dtype=np.uint32)
    wins = expand(keys)
    cells = np.stack([(wins >> np.uint32(2 * i)) & 3 for i in range(11)], axis=1)
    valid = np.ones(NUM_PATTERNS, bool)
    for i in range(5):
        valid &= ~((cells[:, i] != 3) & (cells[:, i + 1] == 3))
    for i in range(6, 11):
        valid &= ~((cells[:, i - 1] == 3) & (cells[:, i] != 3))
    return valid


@pytest.mark.parametrize("rules", list(GameRules), ids=[r.name for r in GameRules])
def test_table_hashes(rules):
    with open(FIXTURES) as fh:
        pinned = json.load(fh)[rules.name]
    pattern, threat = get_tables(rules)
    valid = _valid_mask()
    assert hashlib.sha256(pattern[valid].tobytes()).hexdigest() == pinned["pattern_valid_sha256"]
    assert hashlib.sha256(threat.tobytes()).hexdigest() == pinned["threat_sha256"]


def test_narrow_expand_roundtrip():
    keys = np.arange(0, NUM_PATTERNS, 17, dtype=np.uint32)
    assert (narrow_down(expand(keys)) == keys).all()


def test_promotion_moves_known_pattern():
    # "__XXX_" placed so the new stone at the center completes "_XXX__"-type
    # three: window cells 3,4 = X, center = empty.
    window = (1 << (2 * 3)) | (1 << (2 * 4))  # X at offsets -2, -1
    mask = open_three_promotion_moves(window)
    assert mask != 0
    assert mask & (1 << 2)  # offset -3 promotes to a four
