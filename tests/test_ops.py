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


def test_fused_convnext_trunk_matches_flax():
    """The Pallas fused-trunk forward (ops/convnext_fused.py) matches the
    flax ConvNextPVQMraw apply to bf16 tolerance (interpret mode)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from alphagomoku_tpu.models import create_network
    from alphagomoku_tpu.ops.convnext_fused import make_fused_apply

    net = create_network("ConvNextPVQMraw", blocks=2, filters=32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal((6, 15, 15, net.cfg.input_planes)).astype(np.float32)
    )
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    ref = net.apply(v, x.astype(jnp.bfloat16), train=False)
    out = make_fused_apply(net, v, block_batch=4, interpret=True)(v, x)
    for name in ("policy_logits", "value_logits", "q_logits",
                 "moves_left_logits"):
        a = np.asarray(getattr(ref, name), np.float32)
        b = np.asarray(getattr(out, name), np.float32)
        scale = max(1e-3, float(np.abs(a).max()))
        assert np.abs(a - b).max() <= 0.05 * scale + 5e-3, name
