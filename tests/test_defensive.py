"""Defensive-move table tests (reference coverage model:
test/ab_search/test_defensive_moves.cpp)."""

import numpy as np
import pytest

from alphagomoku_tpu.game.types import CROSS, CIRCLE, NONE, GameRules, invert_sign
from alphagomoku_tpu.patterns import defensive as D
from alphagomoku_tpu.patterns import tables as T


def make_pattern(cells: dict[int, int]) -> int:
    """13-cell extended pattern from {position: sign}."""
    out = 0
    for pos, sign in cells.items():
        out |= sign << (2 * pos)
    return out


@pytest.fixture(scope="module")
def tabs():
    return D.get_tables(GameRules.FREESTYLE)


def test_five_defense_single_completion(tabs):
    # O X X X X ! : a half-open four whose only completion is the center —
    # the only defense is to occupy the completion cell itself (a four open
    # on both ends would be an indefensible open four, mask 0)
    pattern = make_pattern({1: CIRCLE, 2: CROSS, 3: CROSS, 4: CROSS, 5: CROSS})
    mask = tabs.get_moves(pattern, CIRCLE, T.PT_FIVE)
    assert mask == (1 << D.CENTER), bin(mask)


def test_open_four_defense_is_empty(tabs):
    # an open four cannot be defended in freestyle: both completions win
    pattern = make_pattern({3: CROSS, 4: CROSS, 5: CROSS, 7: CROSS})
    # _ X X X ! X _ is a five threat through the center, not an open four;
    # construct a real open four: cells 3..6 attacker, 2 and 7 empty
    pattern = make_pattern({3: CROSS, 4: CROSS, 5: CROSS, 6: CROSS})
    mask = tabs.get_moves(pattern, CIRCLE, T.PT_OPEN_4)
    assert mask == 0, bin(mask)


def test_open_three_defense_contains_center(tabs):
    # the queried cell is where the attacker would CREATE an open three
    # (ThreatType semantics); occupying it is always among the defenses
    pattern = make_pattern({7: CROSS, 8: CROSS})  # "_!XX__" through center
    mask = tabs.get_moves(pattern, CIRCLE, T.PT_OPEN_3)
    assert mask & (1 << D.CENTER), bin(mask)


def test_defenses_are_complete_for_fives(tabs):
    """Soundness property: for five threats, any empty cell OUTSIDE the
    defensive mask loses the line immediately (the attacker five happens)."""
    rng = np.random.default_rng(0)
    rules = GameRules.FREESTYLE
    checked = 0
    for _ in range(200):
        cells = [NONE] * 13
        # attacker four with one gap somewhere near the center
        start = rng.integers(2, 7)
        gap = rng.integers(0, 5)
        for k in range(5):
            if k != gap:
                cells[start + k] = CROSS
        # random side garbage
        for pos in rng.choice([0, 1, 11, 12], size=2, replace=False):
            cells[pos] = int(rng.integers(0, 3))
        if start + gap != D.CENTER:
            continue  # threat must run through the center cell
        pattern = D._encode(cells)
        mask = tabs.get_moves(pattern, CIRCLE, T.PT_FIVE)
        if mask == 0:
            continue
        checked += 1
        for i in range(13):
            if cells[i] == NONE and not (mask >> i) & 1:
                trial = list(cells)
                trial[i] = CIRCLE
                # attacker must now have an immediate five
                assert D._search(trial, CROSS, 1, CROSS, rules) == 1, (
                    f"cell {i} missing from mask {bin(mask)} for {cells}"
                )
    assert checked >= 10


def test_rules_variants_build():
    for rules in (GameRules.STANDARD, GameRules.CARO5, GameRules.RENJU):
        tabs = D.get_tables(rules)
        pattern = make_pattern(
            {1: CIRCLE, 2: CROSS, 3: CROSS, 4: CROSS, 5: CROSS}
        )
        mask = tabs.get_moves(pattern, CIRCLE, T.PT_FIVE)
        assert mask & (1 << D.CENTER), (rules, bin(mask))


def test_board_level_defensive_cells():
    """Board-level union over directions: the defender options against a
    half-open four's completion cell are exactly that cell."""
    board = np.zeros((15, 15), np.int8)
    board[7, 2] = CIRCLE
    board[7, 3:7] = CROSS  # O X X X X ! at (7,7)
    cells = D.defensive_cells_for_threat(
        board, 7, 7, CIRCLE, T.PT_FIVE, GameRules.FREESTYLE
    )
    assert cells == [(7, 7)], cells


def test_board_level_open_three_defenses():
    """Defending the cell where the attacker would make a straight open
    three: taking the cell itself is always an option; all options are empty
    board cells on the threat line."""
    board = np.zeros((15, 15), np.int8)
    board[7, 8] = CROSS
    board[7, 9] = CROSS  # attacker playing (7,7) would make _XXX_
    cells = D.defensive_cells_for_threat(
        board, 7, 7, CIRCLE, T.PT_OPEN_3, GameRules.FREESTYLE
    )
    assert (7, 7) in cells
    assert all(r == 7 for r, c in cells)


@pytest.mark.parametrize("rules", [GameRules.FREESTYLE, GameRules.CARO5])
@pytest.mark.parametrize(
    "threat",
    [T.PT_FIVE, T.PT_OPEN_4, T.PT_DOUBLE_4, T.PT_HALF_OPEN_4, T.PT_OPEN_3],
)
def test_batched_lookup_parity(rules, threat):
    """get_moves_batched must agree with the scalar dispatch on random
    extended patterns for both defender signs."""
    import jax
    import jax.numpy as jnp

    tabs = D.get_tables(rules)
    rng = np.random.default_rng(int(threat) * 10 + int(rules))
    pats, signs, expect = [], [], []
    for _ in range(400):
        cells = [int(x) for x in rng.choice([0, 0, 0, 1, 2], size=13)]
        cells[D.CENTER] = 0  # queried cell is empty
        pattern = D._encode(cells)
        defender = CROSS if rng.random() < 0.5 else CIRCLE
        pats.append(pattern)
        signs.append(defender == CIRCLE)
        expect.append(tabs.get_moves(pattern, defender, threat))
    got = np.asarray(
        D.get_moves_batched(
            rules, jnp.asarray(np.asarray(pats, np.uint32)),
            jnp.asarray(signs), threat,
        )
    )
    np.testing.assert_array_equal(got, np.asarray(expect, np.uint16))
