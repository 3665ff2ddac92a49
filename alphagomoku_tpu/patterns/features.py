"""NN input features: 32 bit-planes per cell, packed in one uint32.

Bit layout is byte-for-byte the reference's
(reference: src/networks/NNInputFeatures.cpp:66-111):

    bit 0     legal move (cell empty)
    bit 1     own stone            bit 2   opponent stone
    bit 3     ones                 bit 7   zeros
    bit 4     cross to move        bit 5   circle to move
    bit 6     forbidden move (renju, cross to move only)
    bits  8-11  own open three, one bit per direction (H, V, D, AD)
    bits 12-15  own half-open four, one bit per direction
    bit 16    own open four        bit 17  own double four
    bit 18    own five             bit 19  own overline
    bits 20-31  same group for the opponent

Computed fully batched from `[B, H, W]` boards: one gather-free window
extraction (`vectorized.windows_all`), two table lookups, and bit math —
no per-cell host loop.  Augmentation shuffles the direction-dependent bits
8-11 / 12-15 / 20-23 / 24-27 on top of the spatial transform
(reference: NNInputFeatures.cpp:111-155).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..game.types import NONE, CROSS, CIRCLE, GameRules
from ..game import vectorized as V
from ..patterns import bitwise
from ..patterns import tables as T
from ..utils import augment

U = np.uint32


def encode(
    tables: V.RuleTables,
    board: jax.Array,
    sign_to_move: jax.Array,
    forbidden_depth: int = 2,
) -> jax.Array:
    """Packed uint32 feature map [B, H, W] from boards [B, H, W] and
    side-to-move [B]."""
    bsz, h, w = board.shape
    own_is_cross = (sign_to_move == CROSS)[:, None, None]  # [B,1,1]

    wins = jnp.moveaxis(V.windows_all(board), 1, -1)  # [B, H, W, 4]
    # gather-free classification (patterns.bitwise): the table-lookup path
    # costs ~2 random gathers per cell-direction, which dominates bulk
    # encoding on TPU; the compiled bit math is pure fused VPU work
    pt_cross, pt_circle = bitwise.classify(wins, GameRules(tables.rules))

    def player_group(pts: jax.Array) -> jax.Array:
        """12-bit per-player group from directional PatternTypes [..., 4]:
        [0-3] open three per dir, [4-7] half-open four per dir, [8] open 4,
        [9] double 4, [10] five, [11] overline (any direction)."""
        g = jnp.zeros(pts.shape[:-1], jnp.uint32)
        for d in range(4):
            p = pts[..., d]
            g = g | ((p == T.PT_OPEN_3).astype(jnp.uint32) << U(d))
            g = g | ((p == T.PT_HALF_OPEN_4).astype(jnp.uint32) << U(4 + d))
        g = g | (jnp.any(pts == T.PT_OPEN_4, -1).astype(jnp.uint32) << U(8))
        g = g | (jnp.any(pts == T.PT_DOUBLE_4, -1).astype(jnp.uint32) << U(9))
        g = g | (jnp.any(pts == T.PT_FIVE, -1).astype(jnp.uint32) << U(10))
        g = g | (jnp.any(pts == T.PT_OVERLINE, -1).astype(jnp.uint32) << U(11))
        return g

    cross_group = player_group(pt_cross)
    circle_group = player_group(pt_circle)
    own_group = jnp.where(own_is_cross, cross_group, circle_group)
    opp_group = jnp.where(own_is_cross, circle_group, cross_group)

    out = (own_group << U(8)) | (opp_group << U(20))
    out = out | U(1 << 3)  # ones plane
    out = out | jnp.where(own_is_cross, U(1 << 4), U(1 << 5))

    empty = board == NONE
    own_stone = jnp.where(own_is_cross, board == CROSS, board == CIRCLE)
    opp_stone = jnp.where(own_is_cross, board == CIRCLE, board == CROSS)
    out = out | empty.astype(jnp.uint32)
    out = out | (own_stone.astype(jnp.uint32) << U(1))
    out = out | (opp_stone.astype(jnp.uint32) << U(2))

    if tables.rules == GameRules.RENJU:
        forb = V.forbidden_plane(tables, board, forbidden_depth)
        forb = forb & own_is_cross  # only marked when cross is to move
        out = out | (forb.astype(jnp.uint32) << U(6))
    return out


def unpack_planes(packed: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """uint32 [B, H, W] -> [B, H, W, 32] planes for NN input (NHWC)."""
    bits = jnp.arange(32, dtype=jnp.uint32)
    return ((packed[..., None] >> bits) & U(1)).astype(dtype)


def unpack_raw_planes(packed: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """The 8 'raw' planes (bits 0-7) used by *raw network variants
    (reference: networks.cpp raw input = H*W*8)."""
    bits = jnp.arange(8, dtype=jnp.uint32)
    return ((packed[..., None] >> bits) & U(1)).astype(dtype)


def _shuffle_directions(packed: jax.Array, perm) -> jax.Array:
    """Permute direction bits in groups 8-11, 12-15, 20-23, 24-27:
    new direction i takes old direction perm[i]
    (reference: NNInputFeatures.cpp:33-51 shuffle_directions)."""
    base = U((1 << 8) | (1 << 12) | (1 << 20) | (1 << 24))
    keep = packed & U(0xF00F00FF)
    out = keep
    for i in range(4):
        out = out | (((packed >> U(perm[i])) & base) << U(i))
    return out


def augment_features(packed: jax.Array, mode: int) -> jax.Array:
    """Apply a static symmetry: spatial transform + direction-bit shuffle
    (reference: NNInputFeatures::augment, NNInputFeatures.cpp:111-155)."""
    out = augment.apply_symmetry(packed, mode)
    perm = augment.DIRECTION_PERM[mode]
    if perm != (0, 1, 2, 3):
        out = _shuffle_directions(out, perm)
    return out


def augment_features_batch(packed: jax.Array, modes: jax.Array) -> jax.Array:
    """Per-sample traced symmetry over a batch [B, H, W], modes int[B]."""
    return jax.vmap(
        lambda x, m: jax.lax.switch(
            m, [lambda v, mm=mm: augment_features(v, mm) for mm in range(8)], x
        )
    )(packed, modes)
