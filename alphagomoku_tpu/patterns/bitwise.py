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


def classify(
    windows: jax.Array,
    rules: GameRules,
    kinds: tuple[str, ...] | None = None,
) -> tuple[jax.Array, jax.Array]:
    """PatternTypes (cross, circle) for packed empty-center windows.

    windows: uint32[...], 2 bits/cell, center (bits 10-11) read as NONE.
    Returns two int32 arrays of PatternType codes, bit-identical to the
    table lookup path.

    kinds: optional subset of T._PRIORITY kind names to evaluate (cells
    matching only skipped kinds classify as 0).  Skipping kinds is exact
    for the kinds kept — priority filtering only ever compares against
    HIGHER-priority kinds, which callers must include.  The solvers use
    this to drop half_open_three (~40% of the rule ops; the classifier is
    VPU-compute-bound inside their lockstep loops)."""
    rules = GameRules(rules)
    want = None if kinds is None else set(kinds)
    results = []
    for sign in (CROSS, CIRCLE):
        win = windows | (U(sign) << U(2 * T.CENTER))
        cells = [(win >> U(2 * p)) & U(3) for p in range(_LEN)]
        out = jnp.zeros(windows.shape, jnp.int32)
        for (kind, code), (code2, rule_list) in zip(
            T._PRIORITY, _compiled_rules(rules, sign)
        ):
            assert code == code2
            if want is not None and kind not in want:
                continue
            hit = None
            for masks in rule_list:
                h = _match_rule(cells, masks)
                hit = h if hit is None else (hit | h)
            out = jnp.where((out == 0) & hit, code, out)
        results.append(out)
    return results[0], results[1]


# every kind the solvers' threat staging reads (all but half_open_three)
THREAT_KINDS = (
    "five", "overline", "open_four", "double_four", "half_open_four",
    "open_three",
)


def five_mask(
    windows: jax.Array, rules: GameRules
) -> tuple[jax.Array, jax.Array]:
    """(cross, circle) bool masks: placing that sign at the (empty) center
    completes a five.  Exactly PT_FIVE of `classify` — five is the highest
    classifier priority, so its rules alone decide it (renju: the black
    five rules carry their own not-overline boundary conditions) — at
    ~1/10th the op count.  The lockstep solvers call this on every
    post-move board."""
    rules = GameRules(rules)
    outs = []
    for sign in (CROSS, CIRCLE):
        win = windows | (U(sign) << U(2 * T.CENTER))
        cells = [(win >> U(2 * p)) & U(3) for p in range(_LEN)]
        hit = None
        for masks in T._classifier_rules("five", rules, sign):
            h = _match_rule(cells, masks)
            hit = h if hit is None else (hit | h)
        outs.append(hit)
    return outs[0], outs[1]


def classify_packed(windows: jax.Array, rules: GameRules) -> jax.Array:
    """uint32 nibble-packed form matching the table encoding:
    cross | circle << 4."""
    cross, circle = classify(windows, rules)
    return (cross | (circle << 4)).astype(jnp.uint32)
