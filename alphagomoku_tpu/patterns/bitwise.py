"""Gather-free pattern classification: the rule DSL compiled to vector bit
math.

The table path (`tables.get_tables` + `take`) costs one random HBM/VMEM
gather per cell per direction — the dominant cost of bulk feature encoding
on TPU.  This module instead compiles the same matching rules
(tables._classifier_rules, themselves replicating the reference's
PatternClassifier definitions, src/patterns/PatternClassifier.cpp:182-327)
into straight-line masked-compare ops on the packed 22-bit windows: pure
VPU work that XLA fuses, no gathers.  Table parity is asserted by
tests/test_bitwise.py over all 4^10 windows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..game.types import CROSS, CIRCLE, GameRules
from . import tables as T

U = np.uint32
_LEN = T.PATTERN_LENGTH  # 11


@functools.lru_cache(maxsize=None)
def _compiled_rules(rules: GameRules, sign: int):
    """[(PatternType code, [rule mask lists])] in priority order."""
    out = []
    for kind, code in T._PRIORITY:
        out.append((code, T._classifier_rules(kind, GameRules(rules), sign)))
    return out


def _match_rule(cells: list[jax.Array], masks: list[int]) -> jax.Array:
    """OR over window offsets of AND over rule positions: does the rule
    match anywhere inside the 11-cell window?  `cells` are the eleven 2-bit
    cell values as uint32 arrays."""
    length = len(masks)
    hit = None
    for off in range(_LEN - length + 1):
        term = None
        for j, mask in enumerate(masks):
            if mask == 0b1111:
                continue  # [any] matches everything
            bit = (U(mask) >> cells[off + j]) & U(1)
            term = bit if term is None else (term & bit)
        if term is None:  # rule is all-[any]
            return jnp.ones_like(cells[0], dtype=bool)
        hit = term if hit is None else (hit | term)
    return hit.astype(bool) if hit.dtype != jnp.bool_ else hit


def classify(windows: jax.Array, rules: GameRules) -> tuple[jax.Array, jax.Array]:
    """PatternTypes (cross, circle) for packed empty-center windows.

    windows: uint32[...], 2 bits/cell, center (bits 10-11) read as NONE.
    Returns two int32 arrays of PatternType codes, bit-identical to the
    table lookup path."""
    rules = GameRules(rules)
    results = []
    for sign in (CROSS, CIRCLE):
        win = windows | (U(sign) << U(2 * T.CENTER))
        cells = [(win >> U(2 * p)) & U(3) for p in range(_LEN)]
        out = jnp.zeros(windows.shape, jnp.int32)
        for code, rule_list in _compiled_rules(rules, sign):
            hit = None
            for masks in rule_list:
                h = _match_rule(cells, masks)
                hit = h if hit is None else (hit | h)
            out = jnp.where((out == 0) & hit, code, out)
        results.append(out)
    return results[0], results[1]


def classify_packed(windows: jax.Array, rules: GameRules) -> jax.Array:
    """uint32 nibble-packed form matching the table encoding:
    cross | circle << 4."""
    cross, circle = classify(windows, rules)
    return (cross | (circle << 4)).astype(jnp.uint32)
