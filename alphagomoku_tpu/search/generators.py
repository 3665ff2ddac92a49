"""Root move-restriction masks: the opening edge-generator family.

Counterpart of the reference's specialized edge generators
(reference: src/search/monte_carlo/EdgeGenerator.cpp —
CenterExcludingGenerator, CenterOnlyGenerator,
SymmetricalExcludingGenerator, used by the swap/swap2 opening controllers,
player/EngineController.hpp:44-60).  Here they are plain `[B, H, W]` bool
masks ANDed into the root move restriction (`run_search(root_move_mask=)`),
which composes with the solver's must-defend restriction."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import augment


def center_excluding_mask(
    batch: int, rows: int, cols: int, radius: int
) -> jax.Array:
    """Exclude a Chebyshev-`radius` square around the center (swap2 second
    stones must leave the center, reference: CenterExcludingGenerator)."""
    r0, c0 = rows // 2, cols // 2
    rr = jnp.abs(jnp.arange(rows)[:, None] - r0)
    cc = jnp.abs(jnp.arange(cols)[None, :] - c0)
    mask = jnp.maximum(rr, cc) > radius
    return jnp.broadcast_to(mask, (batch, rows, cols))


def center_only_mask(batch: int, rows: int, cols: int, radius: int) -> jax.Array:
    """Restrict to the center square (reference: CenterOnlyGenerator)."""
    return ~center_excluding_mask(batch, rows, cols, radius)


def symmetrical_excluding_mask(board: jax.Array) -> jax.Array:
    """Keep one representative per symmetry orbit of the position.

    For each board symmetry that leaves the position invariant, symmetric
    move duplicates are pruned: a cell stays allowed only if its flat index
    is minimal within its orbit (reference: SymmetricalExcludingGenerator,
    used on (near-)empty opening positions)."""
    bsz, h, w = board.shape
    if h != w:
        syms = range(4)
    else:
        syms = range(8)
    rr = jnp.broadcast_to(jnp.arange(h)[:, None], (h, w))
    cc = jnp.broadcast_to(jnp.arange(w)[None, :], (h, w))
    min_orbit = jnp.full((bsz, h, w), h * w, jnp.int32)
    identity_flat = rr * w + cc
    for s in syms:
        invariant = jnp.all(
            augment.apply_symmetry(board, s) == board, axis=(1, 2)
        )  # [B]
        tr, tc = augment.symmetry_location(rr, cc, h, w, s)
        flat = (tr * w + tc).astype(jnp.int32)
        min_orbit = jnp.minimum(
            min_orbit, jnp.where(invariant[:, None, None], flat, h * w)
        )
    return identity_flat[None] <= min_orbit
