"""Zobrist hashing, batched (reference: include/alphagomoku/search/
ZobristHashing.hpp:101-127, src/search/ZobristHashing.cpp).

Two flavors, as in the reference:
- full_hash: 64-bit hash of (board, side to move) — transposition-table
  keys across whole positions (reference: FullZobristHashing, used by
  NodeCache).
- incremental 128-bit hash with O(1) per-move XOR updates — solver
  shared-hash-table keys (reference: FastZobristHashing + SharedHashTable).

JAX runs in 32-bit mode by default, so wide keys are stored as independent
uint32 LANES on a trailing axis (XOR mixes no bits across lanes, making an
n-lane hash exactly equivalent to an n*32-bit hash): full hashes are
[..., 2] uint32, incremental hashes [..., 4] uint32.

Keys are generated once per board geometry from a fixed seed so hashes are
reproducible across processes (hosts in a multi-host run see identical
tables)."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..game.types import CROSS, CIRCLE

FULL_LANES = 2  # 64-bit
INCR_LANES = 4  # 128-bit


class ZobristTable(NamedTuple):
    # cached as host numpy (a cached jnp constant would capture the tracer
    # of whichever jit first built it); jnp ops convert per-trace
    cell_keys: np.ndarray  # [H*W, 2, FULL_LANES] uint32 per (cell, sign-1)
    stm_keys: np.ndarray  # [2, FULL_LANES] uint32 side-to-move keys
    cell_keys_incr: np.ndarray  # [H*W, 2, INCR_LANES] uint32


@functools.lru_cache(maxsize=None)
def make_table(rows: int, cols: int, seed: int = 0x5EED) -> ZobristTable:
    rng = np.random.default_rng(seed + rows * 1000 + cols)
    n = rows * cols

    def keys(shape):
        return rng.integers(0, 2**32, size=shape, dtype=np.uint32)

    return ZobristTable(
        cell_keys=keys((n, 2, FULL_LANES)),
        stm_keys=keys((2, FULL_LANES)),
        cell_keys_incr=keys((n, 2, INCR_LANES)),
    )


def _xor_reduce_cells(board_flat: jax.Array, keyset: jax.Array) -> jax.Array:
    """XOR the keys of all placed stones: [B, HW] board + [HW, 2, L] keys ->
    [B, L]."""
    kx = jnp.where(
        (board_flat == CROSS)[..., None], keyset[None, :, 0, :], jnp.uint32(0)
    )
    ko = jnp.where(
        (board_flat == CIRCLE)[..., None], keyset[None, :, 1, :], jnp.uint32(0)
    )
    return jax.lax.reduce(
        kx ^ ko, jnp.uint32(0), jax.lax.bitwise_xor, dimensions=(1,)
    )


def full_hash(table: ZobristTable, board: jax.Array, stm: jax.Array) -> jax.Array:
    """64-bit position hash [B, 2]u32 from boards [B, H, W] + side to move
    [B] (reference: FullZobristHashing::getHash)."""
    flat = board.reshape(board.shape[0], -1)
    h = _xor_reduce_cells(flat, table.cell_keys)
    stm_key = jnp.where(
        (stm == CROSS)[:, None], table.stm_keys[0][None], table.stm_keys[1][None]
    )
    return h ^ stm_key


def incremental_hash(table: ZobristTable, board: jax.Array) -> jax.Array:
    """128-bit board hash [B, 4]u32 (reference: FastZobristHashing::getHash)."""
    flat = board.reshape(board.shape[0], -1)
    return _xor_reduce_cells(flat, table.cell_keys_incr)


def update_hash(
    table: ZobristTable, h: jax.Array, action: jax.Array, sign: jax.Array
) -> jax.Array:
    """O(1) per-move update of the 128-bit hash [B, 4]: flat `action` [B],
    `sign` [B] in {CROSS, CIRCLE} (reference: FastZobristHashing::updateHash
    — XOR is its own inverse, so the same call undoes a move)."""
    keys = jnp.asarray(table.cell_keys_incr)
    idx = jnp.clip(action, 0, keys.shape[0] - 1)
    col = jnp.where(sign == CROSS, 0, 1)
    return h ^ keys[idx, col]
