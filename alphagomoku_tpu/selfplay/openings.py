"""Balanced opening generation for selfplay and evaluation matches.

Counterpart of the reference's OpeningGenerator
(reference: include/alphagomoku/selfplay/OpeningGenerator.hpp:23-70,
src/selfplay/OpeningGenerator.cpp:21-66): propose random short openings,
SOLVER-CHECK the candidates (the reference runs AlphaBetaSearch with a
1000-node limit and discards proven positions — here the batched VCT win
solver + loss prover run over all candidates in lockstep), then evaluate
the survivors with the network in one batch and keep the ones whose
evaluation is closest to balanced."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..game.types import CROSS, CIRCLE
from ..game import vectorized as V
from ..search import mcts


def propose_random_openings(
    key: jax.Array, count: int, rows: int, cols: int, stones: int, span: int = 4
) -> jax.Array:
    """[count, H, W] int8 boards with `stones` alternating stones placed near
    the center (device-side, jit-compatible)."""
    r0, c0 = rows // 2, cols // 2
    keys = jax.random.split(key, stones)
    boards = jnp.zeros((count, rows, cols), jnp.int8)

    def place(boards, inp):
        i, k = inp
        kr, kc, kretry = jax.random.split(k, 3)
        r = jnp.clip(
            r0 + jax.random.randint(kr, (count,), -span, span + 1), 0, rows - 1
        )
        c = jnp.clip(
            c0 + jax.random.randint(kc, (count,), -span, span + 1), 0, cols - 1
        )
        b = jnp.arange(count)
        occupied = boards[b, r, c] != V.NONE
        # collision: shift deterministically to a nearby free-ish cell
        r = jnp.where(occupied, (r + 1) % rows, r)
        c = jnp.where(occupied, (c + 3) % cols, c)
        occupied = boards[b, r, c] != V.NONE
        r = jnp.where(occupied, (r + 2) % rows, r)
        c = jnp.where(occupied, (c + 5) % cols, c)
        sign = jnp.where(i % 2 == 0, CROSS, CIRCLE).astype(jnp.int8)
        boards = boards.at[b, r, c].set(
            jnp.where(boards[b, r, c] == V.NONE, sign, boards[b, r, c])
        )
        return boards, None

    boards, _ = jax.lax.scan(place, boards, (jnp.arange(stones), keys))
    return boards


def generate_balanced_openings(
    net_apply: Callable,
    variables: Any,
    tables: V.RuleTables,
    key: jax.Array,
    count: int,
    rows: int,
    cols: int,
    stones: int = 4,
    oversample: int = 4,
    raw_input: bool = True,
    solver_check: bool = True,
    solver_steps: int = 48,
) -> jax.Array:
    """Keep the `count` most balanced of `count*oversample` random openings,
    judged by the network's value head (jit the caller).  With
    `solver_check`, candidates the batched solver PROVES (a VCT win for the
    mover or a proven loss) are discarded first — a provably decided
    opening can never be balanced (reference: OpeningGenerator.cpp:21-66
    runs the alpha-beta solver on every candidate and keeps only unproven
    ones)."""
    k1, k2 = jax.random.split(key)
    cand = propose_random_openings(k1, count * oversample, rows, cols, stones)
    stm = jnp.full((count * oversample,), CROSS if stones % 2 == 0 else CIRCLE, jnp.int8)
    _, value, _, _, _, _ = mcts._evaluate(
        net_apply, variables, tables, cand, stm, raw_input
    )
    imbalance = jnp.abs(value[:, 0] + 0.5 * value[:, 1] - 0.5)
    if solver_check:
        from ..search import vct_batched as _vctb

        sres = _vctb.solve(
            tables, cand, stm, max_depth=6, max_steps=solver_steps
        )
        lres = _vctb.solve_loss(
            tables, cand, stm, max_options=8, max_depth=6,
            max_steps=solver_steps,
        )
        proven = sres.win | lres.loss
        imbalance = jnp.where(proven, jnp.float32(jnp.inf), imbalance)
    _, idx = jax.lax.top_k(-imbalance, count)
    return cand[idx]
