"""Pallas kernel unit tests (interpret mode, CPU-safe): the kernels must be
bit-identical to their pure-jnp reference implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.ops.score_scan import score_scan, score_scan_reference
from alphagomoku_tpu.search import score as S


@pytest.mark.parametrize("B,D,K,seed", [(8, 12, 16, 0), (16, 16, 32, 1), (24, 6, 8, 2)])
def test_score_scan_kernel_matches_reference(B, D, K, seed):
    rng = np.random.default_rng(seed)
    # realistic packed scores: mix of unknown evals and proven WIN/LOSS/DRAW
    def rand_scores(shape):
        pv = rng.choice([0, 1, 2, 2, 2, 3], size=shape)
        ev = rng.integers(-200, 200, size=shape)
        dist = rng.integers(0, 30, size=shape)
        ev = np.where(pv == 3, -dist, np.where(pv == 2, ev, dist))
        return ((pv << 13) | (4000 + ev)).astype(np.uint16)

    start = rand_scores((B,))
    valid = rng.random((B, D)) < 0.7
    # paths are depth prefixes: valid must be a prefix mask for realism
    valid = np.sort(valid, axis=1)[:, ::-1].copy()
    sl = rng.integers(0, K, size=(B, D)).astype(np.int32)
    es = rand_scores((B, D, K))
    ea = rng.random((B, D, K)) < 0.8
    ea[..., 0] = True
    comp = rng.random((B, D)) < 0.5
    ns = rand_scores((B, D))

    args = (
        jnp.asarray(start), jnp.asarray(valid), jnp.asarray(sl),
        jnp.asarray(es), jnp.asarray(ea), jnp.asarray(comp), jnp.asarray(ns),
    )
    ref_e, ref_ns = score_scan_reference(*args)
    ker_e, ker_ns = score_scan(*args, interpret=True)
    assert np.array_equal(np.asarray(ref_e), np.asarray(ker_e))
    assert np.array_equal(np.asarray(ref_ns), np.asarray(ker_ns))
