"""Defensive-move tables: the complete defender option sets per threat.

Exact port of the reference's DefensiveMoveTable construction
(reference: src/patterns/DefensiveMoveTable.cpp:15-589): for every threat
variant (five completions, open fours, double fours) and every 8-bit side
context, a bounded line search determines which defender placements avoid
losing the line; half-open-four and open-three defenses are derived from
the five/open-four tables at lookup time with positional shifts, exactly as
the reference does.

These sets are the soundness foundation for VCT-style AND-node (defender)
branching: every returned mask is COMPLETE — any defender reply outside it
loses the local line, so refuting just the masked replies proves the line.

Tables are built once per rule variant in plain Python (the search space is
tiny: <= 6 variants x 256 contexts x 2 signs x <= 13-cell lines, depth 3)
and exposed both as scalar lookups and as flat numpy arrays for future
batched use.
"""

from __future__ import annotations

import functools

import numpy as np

from ..game.types import CROSS, CIRCLE, NONE, GameRules, invert_sign
from . import tables as T

EXT_LENGTH = 13  # extended pattern (reference: RawPattern.hpp ExtendedPattern)
CENTER = 6  # center cell of the 13-cell pattern (Pattern::length-1)/2 + 1


def _cells(encoded: int, length: int) -> list[int]:
    return [(encoded >> (2 * i)) & 3 for i in range(length)]


def _encode(cells: list[int]) -> int:
    out = 0
    for i, c in enumerate(cells):
        out |= c << (2 * i)
    return out


def _overline_allowed(rules: GameRules, attacker: int) -> bool:
    # (reference: DefensiveMoveTable.cpp:19-22)
    return (
        rules == GameRules.FREESTYLE
        or (rules == GameRules.RENJU and attacker == CIRCLE)
        or rules == GameRules.CARO6
    )


def _blocked_allowed(rules: GameRules, attacker: int) -> bool:
    # (reference: DefensiveMoveTable.cpp:23-26)
    return rules not in (GameRules.CARO5, GameRules.CARO6)


def _is_five(cells: list[int], attacker: int, rules: GameRules) -> bool:
    """(reference: DefendFive::is_five — interior fives only, with the
    rule-dependent overline/blocked side conditions)"""
    defender = invert_sign(attacker)
    allow_ol = _overline_allowed(rules, attacker)
    allow_bl = _blocked_allowed(rules, attacker)
    n = len(cells)
    for i in range(1, n - 5):
        if all(cells[i + k] == attacker for k in range(5)):
            first, last = cells[i - 1], cells[i + 5]
            win_overline = True if allow_ol else (
                first != attacker and last != attacker
            )
            win_blocked = True if allow_bl else not (
                first == defender and last == defender
            )
            if win_overline and win_blocked:
                return True
    return False


def _search(cells: list[int], sign: int, depth: int, attacker: int, rules) -> int:
    """Bounded negamax over the line: 1 = the attacker reaches a five
    (reference: DefendFive::search)."""
    outcome = -1
    for i, c in enumerate(cells):
        if c == NONE:
            cells[i] = sign
            if _is_five(cells, attacker, rules):
                cells[i] = NONE
                return 1
            if depth > 1:
                tmp = -_search(cells, invert_sign(sign), depth - 1, attacker, rules)
            else:
                tmp = 0
            cells[i] = NONE
            outcome = max(outcome, tmp)
    return outcome


def _defend(
    encoded: int, length: int, offset: int, defender: int, rules, depth: int
) -> int:
    """16-bit mask of successful defensive placements, positions relative to
    the extended pattern (reference: DefendFive::operator())."""
    attacker = invert_sign(defender)
    cells = _cells(encoded, length)
    if _is_five(cells, attacker, rules):
        return 0
    if _search(cells, attacker, depth, attacker, rules) == 0:
        return 0
    result = 0
    for i, c in enumerate(cells):
        if c == NONE:
            cells[i] = defender
            if _search(cells, attacker, depth, attacker, rules) != 1:
                pos = offset + i
                if 0 <= pos < 16:
                    result |= 1 << pos
            cells[i] = NONE
    return result


# threat variant definitions (reference: DefendFive/DefendOpenFour/
# DefendDoubleFour/DefendHalfOpenFour/DefendOpenThree mask constants)
_FIVE_MASKS = {CROSS: [85, 277, 325, 337, 340], CIRCLE: [170, 554, 650, 674, 680]}
_FIVE_OFFSETS = [2, 3, 4, 5, 6]
_OPEN4_MASKS = {CROSS: [84, 276, 324, 336], CIRCLE: [168, 552, 648, 672]}
_OPEN4_OFFSETS = [2, 3, 4, 5]
_D4_MASKS = {
    CROSS: [4177, 4369, 4417, 20549, 20741, 86037],
    CIRCLE: [8354, 8738, 8834, 41098, 41482, 172074],
}
_D4_LENGTHS = [7, 7, 7, 8, 8, 9]
_D4_OFFSETS = [2, 3, 4, 2, 3, 2]
_HO4_MASKS = {
    CROSS: [21, 69, 81, 84, 21, 261, 273, 276, 69, 261, 321, 324, 81, 273, 321,
            336, 84, 276, 324, 336],
    CIRCLE: [42, 138, 162, 168, 42, 522, 546, 552, 138, 522, 642, 648, 162, 546,
             642, 672, 168, 552, 648, 672],
}
_HO4_OFFSETS = [3, 4, 5, 6, 2, 4, 5, 6, 2, 3, 5, 6, 2, 3, 4, 6, 2, 3, 4, 5]
_OPEN3_MASKS = {
    CROSS: [20, 68, 80, 20, 260, 272, 68, 260, 320, 80, 272, 320],
    CIRCLE: [40, 136, 160, 40, 520, 544, 136, 520, 640, 160, 544, 640],
}
_OPEN3_OFFSETS = [3, 4, 5, 2, 4, 5, 2, 3, 5, 2, 3, 4]


class DefensiveTables:
    """(reference: DefensiveMoveTable five/open_four/double_four tables,
    each [variant, 256 contexts] -> 16-bit masks per defender sign)"""

    def __init__(self, rules: GameRules):
        self.rules = GameRules(rules)
        # tables[variant][context] -> (mask_for_cross, mask_for_circle)
        self.five = self._build(_FIVE_MASKS, [5] * 5, _FIVE_OFFSETS, depth=1)
        self.open_four = self._build(_OPEN4_MASKS, [6] * 4, _OPEN4_OFFSETS, depth=3)
        self.double_four = self._build(_D4_MASKS, _D4_LENGTHS, _D4_OFFSETS, depth=3)

    def _build(self, masks, lengths, offsets, depth):
        out = np.zeros((len(offsets), 256, 2), np.uint16)
        for i in range(len(offsets)):
            length = lengths[i]
            for j in range(256):
                left = j & 0x0F
                right = (j & 0xF0) << (2 * length)
                offset = offsets[i] - 2
                for col, defender in enumerate((CROSS, CIRCLE)):
                    attacker = invert_sign(defender)
                    ext = left | (masks[attacker][i] << 4) | right
                    out[i, j, col] = _defend(
                        ext, length + 4, offset, defender, self.rules, depth
                    )
        return out

    # -- lookup (reference: DefensiveMoveTable::getMoves dispatch) ---------

    def get_moves(self, pattern: int, defender: int, threat: int) -> int:
        """Defensive cells for the given 13-cell extended `pattern` (2 bits
        per cell), defender sign, and PatternType `threat`.  Returns a
        16-bit mask over the 13 pattern positions."""
        attacker = invert_sign(defender)
        col = 0 if defender == CROSS else 1

        def sub(begin, length):
            return (pattern >> (2 * begin)) & ((1 << (2 * length)) - 1)

        def ctx(begin, end):
            left = (pattern >> (2 * (begin - 2))) & 15
            right = (pattern >> (2 * end)) & 15
            return left | (right << 4)

        if threat == T.PT_FIVE:
            for i, begin in enumerate(_FIVE_OFFSETS):
                if sub(begin, 5) == _FIVE_MASKS[attacker][i]:
                    return int(self.five[i, ctx(begin, begin + 5), col])
            return 0
        if threat == T.PT_OPEN_4:
            for i, begin in enumerate(_OPEN4_OFFSETS):
                if sub(begin, 6) == _OPEN4_MASKS[attacker][i]:
                    return int(self.open_four[i, ctx(begin, begin + 6), col])
            return 0
        if threat == T.PT_DOUBLE_4:
            for i, begin in enumerate(_D4_OFFSETS):
                length = _D4_LENGTHS[i]
                if sub(begin, length) == _D4_MASKS[attacker][i]:
                    return int(self.double_four[i, ctx(begin, begin + length), col])
            return 0
        if threat == T.PT_HALF_OPEN_4:
            # derived from the five tables with positional shifts
            # (reference: getMoves HALF_OPEN_4 branch incl. the caro
            # multi-threat accumulation)
            allow_ol = _overline_allowed(self.rules, attacker)
            allow_bl = _blocked_allowed(self.rules, attacker)
            defender_sign = defender
            result = 1 << CENTER
            for i, begin in enumerate(_HO4_OFFSETS):
                if sub(begin, 5) != _HO4_MASKS[attacker][i]:
                    continue
                first = (pattern >> (2 * (begin - 1))) & 3
                last = (pattern >> (2 * (begin + 5))) & 3
                if not allow_ol and (first == attacker or last == attacker):
                    continue
                if not allow_bl and (first == defender_sign and last == defender_sign):
                    continue
                tmp = int(self.five[i // 4, ctx(begin, begin + 5), col])
                shift = begin - _FIVE_OFFSETS[i // 4]
                tmp = (tmp << shift) if shift >= 0 else (tmp >> -shift)
                result |= tmp & 0xFFFF
                if self.rules not in (GameRules.CARO5, GameRules.CARO6):
                    return result
            return result
        if threat == T.PT_OPEN_3:
            for i, begin in enumerate(_OPEN3_OFFSETS):
                if sub(begin, 6) == _OPEN3_MASKS[attacker][i]:
                    result = int(self.open_four[i // 3, ctx(begin, begin + 6), col])
                    shift = begin - _OPEN4_OFFSETS[i // 3]
                    result = (result << shift) if shift >= 0 else (result >> -shift)
                    result |= 1 << CENTER
                    return result & 0xFFFF
            return 0
        return 0


@functools.lru_cache(maxsize=None)
def get_tables(rules: GameRules) -> DefensiveTables:
    return DefensiveTables(GameRules(rules))


# ---------------------------------------------------------------------------
# Board-level lookup (the interface a VCT defender-branching search consumes)
# ---------------------------------------------------------------------------

from ..game.types import DIRECTION_STEPS  # noqa: E402


def _extended_window(board: np.ndarray, row: int, col: int, d: int) -> int:
    """13-cell extended pattern along direction `d` centered on (row, col),
    encoded 2 bits/cell with off-board cells ILLEGAL (3)
    (reference: RawPatternCalculator extended window extraction)."""
    h, w = board.shape
    dr, dc = DIRECTION_STEPS[d]
    out = 0
    for i in range(-CENTER, EXT_LENGTH - CENTER):
        r, c = row + i * dr, col + i * dc
        cell = 3 if not (0 <= r < h and 0 <= c < w) else int(board[r, c])
        out |= cell << (2 * (i + CENTER))
    return out


def get_moves_batched(
    rules: GameRules, patterns, defender_is_circle, threat: int
):
    """Batched, jit-compatible defensive lookup: uint32 extended patterns
    [...] + defender sign mask -> uint16 defense masks [...].

    Same dispatch as DefensiveTables.get_moves, expressed as masked compares
    (one per threat variant) and exact one-hot einsum reads of the tiny
    [variants, 256, 2] tables (byte-split; gathers at per-element indices
    serialize on TPU).  `threat` is static (a PatternType code)."""
    import jax
    import jax.numpy as jnp

    tabs = get_tables(rules)
    patterns = jnp.asarray(patterns, jnp.uint32)
    is_circle = jnp.asarray(defender_is_circle, bool)

    def table_read(table_np, variant: int, ctx, col_is_circle):
        """table[variant, ctx, col] via one-hot einsum, exact."""
        tbl = np.asarray(table_np[variant], np.uint32)  # [256, 2]
        onehot = (
            ctx[..., None] == jnp.arange(256, dtype=jnp.uint32)
        ).astype(jnp.bfloat16)
        flat_on = onehot.reshape(-1, 256)
        out = jnp.zeros(flat_on.shape[0], jnp.uint32)
        for col in (0, 1):
            acc = jnp.zeros(flat_on.shape[0], jnp.uint32)
            for shift in (0, 8):
                byte = jnp.asarray(
                    ((tbl[:, col] >> shift) & 0xFF).astype(np.float32)
                )
                sel = flat_on @ byte
                acc = acc | (
                    jnp.round(sel).astype(jnp.uint32) << np.uint32(shift)
                )
            pick = (col_is_circle.reshape(-1) if col == 1
                    else ~col_is_circle.reshape(-1))
            out = jnp.where(pick, acc, out) if col == 1 else acc
        return out.reshape(ctx.shape)

    def sub(begin, length):
        return (patterns >> np.uint32(2 * begin)) & np.uint32(
            (1 << (2 * length)) - 1
        )

    def ctx_of(begin, end):
        left = (patterns >> np.uint32(2 * (begin - 2))) & np.uint32(15)
        right = (patterns >> np.uint32(2 * end)) & np.uint32(15)
        return left | (right << np.uint32(4))

    def masks_for(mask_dict):
        """Per-element attacker masks: defender circle -> attacker cross."""
        return [
            jnp.where(
                is_circle, np.uint32(mask_dict[CROSS][i]),
                np.uint32(mask_dict[CIRCLE][i]),
            )
            for i in range(len(mask_dict[CROSS]))
        ]

    result = jnp.zeros(patterns.shape, jnp.uint32)
    decided = jnp.zeros(patterns.shape, bool)

    def dispatch(mask_dict, offsets, lengths, table, var_of=lambda i: i,
                 shift_base=None):
        nonlocal result, decided
        am = masks_for(mask_dict)
        for i, begin in enumerate(offsets):
            length = lengths[i] if isinstance(lengths, list) else lengths
            hit = (sub(begin, length) == am[i]) & ~decided
            val = table_read(table, var_of(i), ctx_of(begin, begin + length), is_circle)
            if shift_base is not None:
                shift = begin - shift_base[var_of(i)]
                val = (val << np.uint32(shift)) if shift >= 0 else (
                    val >> np.uint32(-shift)
                )
            result = jnp.where(hit, val & np.uint32(0xFFFF), result)
            decided = decided | hit

    if threat == T.PT_FIVE:
        dispatch(_FIVE_MASKS, _FIVE_OFFSETS, 5, tabs.five)
    elif threat == T.PT_OPEN_4:
        dispatch(_OPEN4_MASKS, _OPEN4_OFFSETS, 6, tabs.open_four)
    elif threat == T.PT_DOUBLE_4:
        dispatch(_D4_MASKS, _D4_OFFSETS, _D4_LENGTHS, tabs.double_four)
    elif threat == T.PT_OPEN_3:
        dispatch(
            _OPEN3_MASKS, _OPEN3_OFFSETS, 6, tabs.open_four,
            var_of=lambda i: i // 3, shift_base=_OPEN4_OFFSETS,
        )
        result = jnp.where(decided, result | np.uint32(1 << CENTER), result)
    elif threat == T.PT_HALF_OPEN_4:
        attacker = jnp.where(is_circle, np.uint32(CROSS), np.uint32(CIRCLE))
        defender = jnp.where(is_circle, np.uint32(CIRCLE), np.uint32(CROSS))
        allow_ol_cross = _overline_allowed(rules, CROSS)
        allow_ol_circle = _overline_allowed(rules, CIRCLE)
        allow_ol = jnp.where(is_circle, allow_ol_cross, allow_ol_circle)
        allow_bl = _blocked_allowed(rules, CROSS)  # sign-independent
        am = masks_for(_HO4_MASKS)
        acc = jnp.full(patterns.shape, np.uint32(1 << CENTER))
        open_rules = rules in (GameRules.CARO5, GameRules.CARO6)
        for i, begin in enumerate(_HO4_OFFSETS):
            first = (patterns >> np.uint32(2 * (begin - 1))) & np.uint32(3)
            last = (patterns >> np.uint32(2 * (begin + 5))) & np.uint32(3)
            side_ok = jnp.where(
                allow_ol, True, (first != attacker) & (last != attacker)
            )
            if not allow_bl:
                side_ok = side_ok & ~((first == defender) & (last == defender))
            hit = (sub(begin, 5) == am[i]) & side_ok & ~decided
            val = table_read(tabs.five, i // 4, ctx_of(begin, begin + 5), is_circle)
            shift = begin - _FIVE_OFFSETS[i // 4]
            val = (val << np.uint32(shift)) if shift >= 0 else (
                val >> np.uint32(-shift)
            )
            acc = jnp.where(hit, acc | (val & np.uint32(0xFFFF)), acc)
            if not open_rules:
                decided = decided | hit
        result = acc
        return result.astype(jnp.uint16)
    return result.astype(jnp.uint16)


def defensive_cells_for_threat(
    board: np.ndarray,
    row: int,
    col: int,
    defender: int,
    threat: int,
    rules: GameRules,
) -> list[tuple[int, int]]:
    """Board cells that defend against the attacker threat the cell
    (row, col) represents (the attacker's potential move there), unioned
    over the directions in which the threat exists.

    This is the complete defender option set for VCT AND-nodes
    (reference: MoveGenerator querying DefensiveMoveTable per opponent
    threat cell)."""
    tabs = get_tables(rules)
    h, w = board.shape
    out: set[tuple[int, int]] = set()
    for d, (dr, dc) in enumerate(DIRECTION_STEPS):
        pattern = _extended_window(board, row, col, d)
        mask = tabs.get_moves(pattern, defender, threat)
        for i in range(EXT_LENGTH):
            if (mask >> i) & 1:
                r = row + (i - CENTER) * dr
                c = col + (i - CENTER) * dc
                if 0 <= r < h and 0 <= c < w and board[r, c] == NONE:
                    out.add((r, c))
    return sorted(out)
