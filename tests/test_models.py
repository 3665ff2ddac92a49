"""Network zoo shape/semantics tests (reference capability:
include/alphagomoku/networks/networks.hpp zoo + AGNetwork pack/unpack)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.models import (
    create_network,
    list_architectures,
    postprocess,
    value_expectation,
)


def _init_and_run(arch, h=15, w=15, batch=2, **kw):
    net = create_network(arch, **kw)
    c = net.cfg.input_planes
    x = jnp.zeros((batch, h, w, c), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    return net, variables, out


def test_flagship_shapes():
    net, variables, out = _init_and_run("ConvNextPVQMraw", blocks=2, filters=32)
    assert out.policy_logits.shape == (2, 15, 15)
    assert out.value_logits.shape == (2, 3)
    assert out.q_logits.shape == (2, 15, 15, 3)
    assert out.moves_left_logits.shape == (2, 225)
    assert out.soft_policy_logits is None


@pytest.mark.parametrize(
    "arch",
    [
        "ResnetPV", "ResnetPVQraw", "BottleneckPVQ", "ConvNextPVQMSraw",
        "FastPolicy", "Transformer_v2",
    ],
)
def test_zoo_architectures(arch):
    net, variables, out = _init_and_run(arch, blocks=1, filters=32)
    assert out.policy_logits.shape == (2, 15, 15)
    assert out.value_logits.shape == (2, 3)
    has_q = "q" in net.cfg.heads
    assert (out.q_logits is not None) == has_q
    assert (out.soft_policy_logits is not None) == ("s" in net.cfg.heads)


def test_registry_covers_reference_zoo():
    names = list_architectures()
    for required in [
        "ResnetPV", "ResnetPVraw", "ResnetPVQ", "ResnetPVQraw",
        "BottleneckPV", "BottleneckPVraw", "BottleneckPVQ",
        "ConvNextPVraw", "ConvNextPVQraw", "ConvNextPVQMraw", "ConvNextPVQMSraw",
    ]:
        assert required in names


def test_postprocess_masking():
    _, _, out = _init_and_run("ConvNextPVQMraw", blocks=1, filters=32)
    mask = np.zeros((2, 15, 15), bool)
    mask[:, 7, 7] = True
    mask[:, 0, 0] = True
    ev = postprocess(out, jnp.asarray(mask))
    p = np.asarray(ev.policy)
    assert np.allclose(p.sum((1, 2)), 1.0, atol=1e-5)
    assert p[0, 1, 1] == 0.0  # illegal cell got zero probability
    v = np.asarray(ev.value)
    assert np.allclose(v.sum(-1), 1.0, atol=1e-5)
    e = np.asarray(value_expectation(ev.value))
    assert ((e >= 0) & (e <= 1)).all()
    assert ev.moves_left.shape == (2,)


def test_train_mode_updates_batch_stats():
    net = create_network("ResnetPV", blocks=1, filters=16)
    x = jnp.ones((4, 15, 15, 32), jnp.float32)
    variables = net.init(jax.random.PRNGKey(1), x, train=False)
    _, mutated = net.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mutated
