"""NNUE-style quantized fast evaluator over threat features.

Counterpart of the reference's NNUE subsystem (reference:
include/alphagomoku/networks/NNUE.hpp:27-38, src/networks/NNUE.cpp:134-155
featurization, :205+ quantized dump; SIMD kernels in nnue_ops): a tiny MLP
over cheap threat-summary features, trained in fp32 and post-training
quantized to int8 weights with per-output-channel scales, evaluated with
integer matmuls.  Its role — a position evaluation orders of magnitude
cheaper than the CNN — is available to the solver and to move ordering
(the reference ships NNUE disabled by default in AlphaBetaSearch, hooks at
AlphaBetaSearch.hpp:57,62; same standing here).

The reference's incremental accumulator exists because its CPU solver
updates one position at a time; in the lockstep batch the whole feature
vector is recomputed per position — one fused reduction over the packed
feature planes."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

U = np.uint32

# threat-summary feature layout: for each player (own, opp):
#   counts of: open3, half-open4 (any dir), open4, double4, five, overline
#   + stone count; plus global: empty count, side-to-move plane bit
NUM_FEATURES = 2 * 7 + 2


def threat_features(packed: jax.Array) -> jax.Array:
    """[B, H, W] packed feature map -> [B, NUM_FEATURES] f32 counts
    (reference featurization: per-row one-hot of threats + stones,
    NNUE.cpp:134-155 — summarized board-wide here)."""
    feats = []
    for base in (8, 20):  # own group, opp group
        g = (packed >> U(base)) & U(0xFFF)
        feats.append((((g >> U(0)) & U(0xF)) != 0).sum((1, 2)))  # open3 any dir
        feats.append((((g >> U(4)) & U(0xF)) != 0).sum((1, 2)))  # ho4 any dir
        feats.append((((g >> U(8)) & 1) == 1).sum((1, 2)))  # open4
        feats.append((((g >> U(9)) & 1) == 1).sum((1, 2)))  # double4
        feats.append((((g >> U(10)) & 1) == 1).sum((1, 2)))  # five
        feats.append((((g >> U(11)) & 1) == 1).sum((1, 2)))  # overline
    feats.append((((packed >> U(1)) & 1) == 1).sum((1, 2)))  # own stones
    feats.append((((packed >> U(2)) & 1) == 1).sum((1, 2)))  # opp stones
    feats.append(((packed & 1) == 1).sum((1, 2)))  # empty/legal
    feats.append((((packed >> U(4)) & 1) == 1).sum((1, 2)))  # cross to move
    out = jnp.stack(feats, -1).astype(jnp.float32)
    return out / 16.0  # keep magnitudes quantization-friendly


class NNUEModel(nn.Module):
    """fp32 training model (reference: TrainingNNUE fp32 MLP)."""

    hidden: int = 32

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        x = nn.relu(nn.Dense(self.hidden)(feats))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(3)(x)  # (win, draw, loss) logits


class QuantizedNNUE(NamedTuple):
    """int8 weights + per-output-channel scales + f32 tail
    (reference: NNUEWeights int8 layer_0 / int16 layer_1 / fp32 tail)."""

    w0: np.ndarray  # int8 [F, H]
    s0: np.ndarray  # f32 [H]
    b0: np.ndarray  # f32 [H]
    w1: np.ndarray  # int8 [H, H]
    s1: np.ndarray  # f32 [H]
    b1: np.ndarray  # f32 [H]
    w2: np.ndarray  # f32 [H, 3] (tail stays fp32, as in the reference)
    b2: np.ndarray  # f32 [3]


def quantize(params: Any) -> QuantizedNNUE:
    """Per-output-channel symmetric int8 quantization of the two hidden
    layers (reference: per-neuron scales in TrainingNNUE::dump)."""
    d0, d1, d2 = (params["params"][f"Dense_{i}"] for i in range(3))

    def q(kernel):
        k = np.asarray(kernel, np.float32)
        scale = np.maximum(np.abs(k).max(0), 1e-8) / 127.0
        return np.round(k / scale).astype(np.int8), scale.astype(np.float32)

    w0, s0 = q(d0["kernel"])
    w1, s1 = q(d1["kernel"])
    return QuantizedNNUE(
        w0=w0, s0=s0, b0=np.asarray(d0["bias"], np.float32),
        w1=w1, s1=s1, b1=np.asarray(d1["bias"], np.float32),
        w2=np.asarray(d2["kernel"], np.float32),
        b2=np.asarray(d2["bias"], np.float32),
    )


def quantized_apply(q: QuantizedNNUE, feats: jax.Array) -> jax.Array:
    """Integer-weight forward pass -> (win, draw, loss) logits [B, 3].

    Activations are quantized to int8 per layer, matmuls accumulate in
    int32 on the device, scales restore the fp32 range (reference:
    avx2_forward int8/int16 pipeline, nnue_ops)."""

    def int8_dense(x_f32, w_int8, w_scale, bias):
        a_scale = jnp.maximum(jnp.abs(x_f32).max(-1, keepdims=True), 1e-8) / 127.0
        x_q = jnp.round(x_f32 / a_scale).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_q, jnp.asarray(w_int8),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * a_scale * w_scale[None, :] + bias[None, :]

    x = jax.nn.relu(int8_dense(feats, q.w0, jnp.asarray(q.s0), jnp.asarray(q.b0)))
    x = jax.nn.relu(int8_dense(x, q.w1, jnp.asarray(q.s1), jnp.asarray(q.b1)))
    return x @ jnp.asarray(q.w2) + jnp.asarray(q.b2)


def evaluate_packed(q: QuantizedNNUE, packed: jax.Array) -> jax.Array:
    """Packed feature map [B, H, W] -> (win, draw) value pairs [B, 2]."""
    wdl = jax.nn.softmax(quantized_apply(q, threat_features(packed)), -1)
    return jnp.stack([wdl[..., 0], wdl[..., 1]], -1)


def train_nnue(
    feats: jax.Array,
    wdl_targets: jax.Array,
    steps: int = 500,
    hidden: int = 32,
    lr: float = 1e-2,
    seed: int = 0,
):
    """Fit the fp32 model to (win, draw, loss) targets; returns
    (variables, final_loss) (reference: TrainingNNUE on GPU then dump)."""
    import optax

    model = NNUEModel(hidden)
    variables = model.init(jax.random.PRNGKey(seed), feats[:1])
    tx = optax.adam(lr)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply({"params": p}, feats)
            return -(wdl_targets * jax.nn.log_softmax(logits, -1)).sum(-1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        params = optax.apply_updates(params, updates)
        return params, opt, loss

    params = variables["params"]
    loss = None
    for _ in range(steps):
        params, opt, loss = step(params, opt)
    return {"params": params}, float(loss)
