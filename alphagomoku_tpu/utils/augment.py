"""The 8 board symmetries, batched and jit-compatible.

Symmetry enumeration matches the reference exactly
(reference: include/alphagomoku/utils/augmentations.hpp:19-29):

    0 IDENTITY            4 FLIP_DIAGONALLY     (transpose)
    1 FLIP_VERTICALLY     5 FLIP_ANTIDIAGONALLY
    2 FLIP_HORIZONTALLY   6 ROTATE_90           (dst[r,c] = src[c, N-1-r])
    3 ROTATE_180          7 ROTATE_270

All transforms act on the LAST TWO axes, so they apply unchanged to
`[B, H, W]` boards, `[B, H, W]` packed feature maps and `[B, C, H, W]`
plane stacks.  Non-square boards only admit symmetries 0-3
(reference: augmentations.hpp:62-65).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IDENTITY = 0
FLIP_VERTICALLY = 1
FLIP_HORIZONTALLY = 2
ROTATE_180 = 3
FLIP_DIAGONALLY = 4
FLIP_ANTIDIAGONALLY = 5
ROTATE_90 = 6
ROTATE_270 = 7

# self-inverse except the quarter rotations (reference: augmentations.hpp:31-53)
INVERSE = (0, 1, 2, 3, 4, 5, 7, 6)

# How each symmetry permutes the 4 line directions (H, V, D, AD):
# new direction i corresponds to old direction DIRECTION_PERM[s][i]
# (reference: src/networks/NNInputFeatures.cpp:115-155 shuffle_directions
# template arguments per mode).
DIRECTION_PERM = (
    (0, 1, 2, 3),  # identity
    (0, 1, 3, 2),  # flip vertically: diagonals swap
    (0, 1, 3, 2),  # flip horizontally: diagonals swap
    (0, 1, 2, 3),  # rotate 180: nothing changes
    (1, 0, 2, 3),  # flip diagonally: H/V swap
    (1, 0, 2, 3),  # flip antidiagonally: H/V swap
    (1, 0, 3, 2),  # rotate 90: both swap
    (1, 0, 3, 2),  # rotate 270: both swap
)


def num_symmetries(rows: int, cols: int) -> int:
    return 8 if rows == cols else 4


def _tx(x: jax.Array) -> jax.Array:
    """Transpose the last two axes."""
    return jnp.swapaxes(x, -1, -2)


def apply_symmetry(x: jax.Array, mode: int) -> jax.Array:
    """Apply symmetry `mode` (static int) to the last two axes of `x`."""
    if mode == IDENTITY:
        return x
    if mode == FLIP_VERTICALLY:
        return x[..., ::-1, :]
    if mode == FLIP_HORIZONTALLY:
        return x[..., :, ::-1]
    if mode == ROTATE_180:
        return x[..., ::-1, ::-1]
    if mode == FLIP_DIAGONALLY:
        return _tx(x)
    if mode == FLIP_ANTIDIAGONALLY:
        # dst[r, c] = src[N-1-c, N-1-r]
        return _tx(x)[..., ::-1, ::-1]
    if mode == ROTATE_90:
        # dst[r, c] = src[c, N-1-r]
        return _tx(x[..., :, ::-1])
    if mode == ROTATE_270:
        # dst[r, c] = src[N-1-c, r]
        return _tx(x[..., ::-1, :])
    raise ValueError(f"bad symmetry mode {mode}")


def inverse_symmetry(x: jax.Array, mode: int) -> jax.Array:
    return apply_symmetry(x, INVERSE[mode])


def apply_symmetry_dyn(x: jax.Array, mode: jax.Array) -> jax.Array:
    """Apply a traced per-call symmetry via lax.switch (same x for all)."""
    return jax.lax.switch(mode, [lambda v, m=m: apply_symmetry(v, m) for m in range(8)], x)


def inverse_symmetry_dyn(x: jax.Array, mode: jax.Array) -> jax.Array:
    inv = jnp.asarray(INVERSE, jnp.int32)[mode]
    return apply_symmetry_dyn(x, inv)


def apply_symmetry_batch(x: jax.Array, modes: jax.Array) -> jax.Array:
    """Per-sample symmetry over a batch: x [B, ..., H, W], modes int[B]."""
    return jax.vmap(apply_symmetry_dyn)(x, modes)


def inverse_symmetry_batch(x: jax.Array, modes: jax.Array) -> jax.Array:
    inv = jnp.asarray(INVERSE, jnp.int32)[modes]
    return apply_symmetry_batch(x, inv)


def symmetry_location(rows: jax.Array, cols: jax.Array, h: int, w: int, mode) -> tuple:
    """Transform (row, col) locations the same way apply_symmetry moves cells:
    if y = apply_symmetry(x, mode) then y[f(r, c)] == x[r, c]."""
    tables = {
        IDENTITY: lambda r, c: (r, c),
        FLIP_VERTICALLY: lambda r, c: (h - 1 - r, c),
        FLIP_HORIZONTALLY: lambda r, c: (r, w - 1 - c),
        ROTATE_180: lambda r, c: (h - 1 - r, w - 1 - c),
        FLIP_DIAGONALLY: lambda r, c: (c, r),
        FLIP_ANTIDIAGONALLY: lambda r, c: (w - 1 - c, h - 1 - r),
        ROTATE_90: lambda r, c: (w - 1 - c, r),
        ROTATE_270: lambda r, c: (c, h - 1 - r),
    }
    if isinstance(mode, int):
        return tables[mode](rows, cols)
    outs = [tables[m](rows, cols) for m in range(8)]
    rr = jnp.stack([o[0] for o in outs], 0)
    cc = jnp.stack([o[1] for o in outs], 0)
    return rr[mode], cc[mode]
