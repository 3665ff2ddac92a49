"""Shared gather-free primitives for the lockstep batched solvers.

Both proof-search machines (search/vcf.py, search/vct_batched.py) advance a
struct-of-arrays state one transition per `lax.while_loop` step.  Per-batch-row
gathers and scatters serialize on TPU (see NEXT.md perf lore), so every state
read/write here is a one-hot masked select or reduce, and board classification
is the full-plane compiled bit math (patterns/bitwise.py) — a handful of fused
VPU kernels instead of hundreds of row queries.

Reference roles: threat_planes mirrors the per-node threat histogram the
reference maintains incrementally (src/search/alpha_beta/ThreatSpaceSearch.cpp
SearchTask setup); hash_boards mirrors the solver's Zobrist keys feeding
SharedHashTable (include/alphagomoku/search/ZobristHashing.hpp).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..game.types import CROSS, CIRCLE, GameRules
from ..game import vectorized as V
from ..patterns import bitwise
from ..patterns import tables as T

U = np.uint32


# ---------------------------------------------------------------------------
# board mutation (one-hot, mask-gated)
# ---------------------------------------------------------------------------

def place(board: jax.Array, mask_b: jax.Array, move_b: jax.Array, sign) -> jax.Array:
    """Place `sign` at flat cell `move_b` on masked boards ([B,H,W] one-hot)."""
    bsz, h, w = board.shape
    onehot = (
        move_b[:, None] == jnp.arange(h * w, dtype=jnp.int32)[None, :]
    ).reshape(bsz, h, w) & mask_b[:, None, None]
    sign_b = jnp.broadcast_to(jnp.asarray(sign, jnp.int8), (bsz,))
    return jnp.where(onehot, sign_b[:, None, None], board)


def unplace(board: jax.Array, mask_b: jax.Array, move_b: jax.Array) -> jax.Array:
    bsz, h, w = board.shape
    onehot = (
        move_b[:, None] == jnp.arange(h * w, dtype=jnp.int32)[None, :]
    ).reshape(bsz, h, w) & mask_b[:, None, None]
    return jnp.where(onehot, jnp.int8(V.NONE), board)


# ---------------------------------------------------------------------------
# fixed-stack frame access (one-hot over the depth axis)
# ---------------------------------------------------------------------------

def plane_at(arr_bdx: jax.Array, ply: jax.Array) -> jax.Array:
    """Read the [B, X] row of a [B, D, X] array at per-board ply."""
    d = arr_bdx.shape[1]
    sel = (jnp.arange(d)[None, :] == ply[:, None])[:, :, None]
    return jnp.where(sel, arr_bdx, False).sum(1, dtype=bool)


def set_plane(arr_bdx, ply, mask_b, new_bx):
    d = arr_bdx.shape[1]
    sel = (jnp.arange(d)[None, :] == ply[:, None])[:, :, None] & mask_b[:, None, None]
    return jnp.where(sel, new_bx[:, None, :], arr_bdx)


def col_at(arr_bd: jax.Array, ply: jax.Array) -> jax.Array:
    sel = jnp.arange(arr_bd.shape[1])[None, :] == ply[:, None]
    return jnp.where(sel, arr_bd, 0).sum(1).astype(arr_bd.dtype)


def set_col(arr_bd, ply, mask_b, val_b):
    sel = (jnp.arange(arr_bd.shape[1])[None, :] == ply[:, None]) & mask_b[:, None]
    val_b = jnp.broadcast_to(jnp.asarray(val_b, arr_bd.dtype), mask_b.shape)
    return jnp.where(sel, val_b[:, None], arr_bd)


# ---------------------------------------------------------------------------
# position hashing (elementwise — no table gathers)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _zobrist_keys(hw: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-cell uint32 keys for CROSS/CIRCLE stones, two independent tables;
    cached as NUMPY (jnp in lru_cache leaks tracers; see NEXT.md lore)."""
    rng = np.random.RandomState(0xC0FFEE)
    k1 = rng.randint(0, 1 << 32, size=(hw, 3), dtype=np.uint64).astype(np.uint32)
    k2 = rng.randint(0, 1 << 32, size=(hw, 3), dtype=np.uint64).astype(np.uint32)
    return k1[:, CROSS], k1[:, CIRCLE], k2[:, CROSS], k2[:, CIRCLE]


def hash_boards(board: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Position hashes [B] (uint32 x2): XOR-reduce of per-cell keys selected
    ELEMENTWISE by stone value (a jnp.take over the key table serializes —
    measured 1.5 ms/step at batch 1280 before this rewrite)."""
    bsz, h, w = board.shape
    k1x, k1o, k2x, k2o = _zobrist_keys(h * w)
    flat = board.reshape(bsz, h * w)
    is_x = flat == CROSS
    is_o = flat == CIRCLE

    def mix(kx, ko):
        keys = jnp.where(is_x, jnp.asarray(kx)[None, :],
                         jnp.where(is_o, jnp.asarray(ko)[None, :], U(0)))
        return jax.lax.reduce(keys, U(0), jax.lax.bitwise_xor, dimensions=(1,))

    return mix(k1x, k1o), mix(k2x, k2o)


# ---------------------------------------------------------------------------
# threat classification (full-plane, rule-exact)
# ---------------------------------------------------------------------------

def classify(
    board: jax.Array,
    rules: GameRules,
    kinds: tuple[str, ...] | None = None,
) -> tuple[jax.Array, jax.Array]:
    """(pt_cross, pt_circle) PatternType planes [B, H, W, 4] for every cell."""
    wins4 = jnp.moveaxis(V.windows_all(board), 1, -1)
    return bitwise.classify(wins4, rules, kinds)


def five_plane_of(
    board: jax.Array, rules: GameRules, sign_is_circle: jax.Array
) -> jax.Array:
    """Empty cells completing a five for the per-board sign: [B, H, W].
    Five-rules-only bit math (bitwise.five_mask) — ~10x cheaper than a full
    classification, for the solvers' per-transition threat checks."""
    wins4 = jnp.moveaxis(V.windows_all(board), 1, -1)
    fx, fo = bitwise.five_mask(wins4, rules)
    five = jnp.where(sign_is_circle[:, None, None, None], fo, fx)
    return jnp.any(five, -1) & (board == V.NONE)


def five_plane(pts: jax.Array, empty: jax.Array) -> jax.Array:
    """Empty cells completing a five for the classified actor: [B, H, W].

    Full-plane replacement for the old windows_at_many path (which built a
    [B,Q,4,HW] intermediate plus row gathers/scatters — measured 0.6–2.5
    ms/step); PT_FIVE is rule-exact per the classifier (renju: black fives
    exclude overlines, and a five trumps a forbidden cell)."""
    return jnp.any(pts == T.PT_FIVE, -1) & empty


def actor_planes(pts: jax.Array, empty: jax.Array, is_cross_actor,
                 renju: bool) -> dict:
    """Threat planes for one actor from its PatternType planes [B,H,W,4];
    renju restricts black (reference: MoveGenerator threat staging +
    rules.cpp forbidden classes).  All entries are [B, H, W] except n3."""
    five = jnp.any(pts == T.PT_FIVE, -1) & empty
    n4 = (
        (pts == T.PT_HALF_OPEN_4)
        | (pts == T.PT_OPEN_4)
        | (pts == T.PT_DOUBLE_4)
    ).sum(-1)
    any_d4 = jnp.any(pts == T.PT_DOUBLE_4, -1)
    any_o4 = jnp.any(pts == T.PT_OPEN_4, -1)
    n3 = (pts == T.PT_OPEN_3).sum(-1)
    overline = jnp.any(pts == T.PT_OVERLINE, -1)
    # certain forbidden needs no 3x3 recursion: overline, a double-four
    # line, or fours in two directions
    certain_forb = (overline | any_d4 | (n4 >= 2)) & is_cross_actor
    maybe_forb = certain_forb | ((n3 >= 2) & is_cross_actor)
    if not renju:
        certain_forb = jnp.zeros_like(five)
        maybe_forb = jnp.zeros_like(five)
    four = (n4 >= 1) & empty & ~certain_forb
    win3 = (any_o4 | any_d4 | (n4 + any_o4.astype(n4.dtype) >= 2)) & empty
    if renju:
        # black's double-4 / 4x4 forks are forbidden, not wins
        win3 = jnp.where(jnp.broadcast_to(is_cross_actor, win3.shape),
                         any_o4 & empty, win3)
    three = (n3 >= 1) & empty & ~maybe_forb
    return dict(five=five, four=four, win3=win3, three=three, n3=n3,
                certain_forb=certain_forb, maybe_forb=maybe_forb)


def pts_at_cell(pts: jax.Array, move_b: jax.Array) -> jax.Array:
    """PatternTypes of one flat cell per board: [B,H,W,4] + [B] -> [B,4]
    via a one-hot masked reduce."""
    bsz, h, w, _ = pts.shape
    onehot = (
        move_b[:, None] == jnp.arange(h * w, dtype=jnp.int32)[None, :]
    )[:, :, None]
    return jnp.where(onehot, pts.reshape(bsz, h * w, 4), 0).sum(1)
