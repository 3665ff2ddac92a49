"""Decompose the renju per-step cost: encode(+forbidden_plane) vs
outcome_after vs the full search step, at bench_matrix shapes.

Run on TPU: python tools/profile_renju.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from alphagomoku_tpu.game.types import GameRules, CROSS, CIRCLE
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.patterns import features as F


def timed(f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    batch, size = 1024, 15
    rng = np.random.default_rng(0)
    boards = np.zeros((batch, size, size), np.int8)
    for b in range(batch):
        n = rng.integers(2, 24)
        cells = rng.choice(size * size, size=n, replace=False)
        boards[b].flat[cells] = np.where(np.arange(n) % 2 == 0, CROSS, CIRCLE)
    boards = jnp.asarray(boards)
    stm = jnp.full((batch,), CROSS, jnp.int8)

    t_renju = V.device_tables(GameRules.RENJU)
    t_free = V.device_tables(GameRules.FREESTYLE)

    enc_r = jax.jit(lambda b, s: F.encode(t_renju, b, s))
    enc_f = jax.jit(lambda b, s: F.encode(t_free, b, s))
    fp = jax.jit(lambda b: V.forbidden_plane(t_renju, b))

    rows = jnp.asarray(rng.integers(0, size, batch), jnp.int32)
    cols = jnp.asarray(rng.integers(0, size, batch), jnp.int32)
    stones = (boards != V.NONE).sum((1, 2)).astype(jnp.int32)
    oa_r = jax.jit(
        lambda b, r, c: V.outcome_after(t_renju, b, r, c, stm, stones, size * size)
    )
    oa_f = jax.jit(
        lambda b, r, c: V.outcome_after(t_free, b, r, c, stm, stones, size * size)
    )
    isf = jax.jit(lambda b, r, c: V.is_forbidden(t_renju, b, r, c, 2))

    print(f"encode renju      : {timed(enc_r, boards, stm)*1e3:8.2f} ms")
    print(f"encode freestyle  : {timed(enc_f, boards, stm)*1e3:8.2f} ms")
    print(f"forbidden_plane   : {timed(fp, boards)*1e3:8.2f} ms")
    print(f"outcome_after renju: {timed(oa_r, boards, rows, cols)*1e3:7.2f} ms")
    print(f"outcome_after free : {timed(oa_f, boards, rows, cols)*1e3:7.2f} ms")
    print(f"is_forbidden [B]  : {timed(isf, boards, rows, cols)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
