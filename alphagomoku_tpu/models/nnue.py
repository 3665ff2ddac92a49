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

# per-cell feature layout, exactly the reference's (NNUE.cpp:134-155):
# 16 features per cell: cross ThreatType one-hot OPEN_3..FIVE at [0..6],
# circle at [7..13], stone one-hot (cross, circle) at [14..15];
# plus one leading side-to-move feature.
CELL_FEATURES = 16


def num_features(rows: int, cols: int) -> int:
    return 1 + rows * cols * CELL_FEATURES


def nnue_features(tables, board: jax.Array, stm: jax.Array) -> jax.Array:
    """[B, H, W] board + [B] side-to-move -> [B, 1 + H*W*16] f32, the
    reference featurization (NNUE.cpp:134-155: feature[0] = cross to move,
    then per cell one-hots of each player's ThreatType in OPEN_3..FIVE and
    the stone).  Computed batched via the gather-free bitwise classifier
    (the reference walks its incremental ThreatHistogram instead)."""
    from ..game.types import CROSS, CIRCLE, GameRules
    from ..game import vectorized as V
    from ..patterns import bitwise
    from ..patterns import tables as T

    board = jnp.asarray(board)
    bsz, h, w = board.shape
    wins = jnp.moveaxis(V.windows_all(board), 1, -1)  # [B, H, W, 4]
    pts_cross, pts_circle = bitwise.classify(wins, GameRules(tables.rules))
    false_ = jnp.zeros((bsz, h, w), bool)
    tt_cross = V.threat_type(tables, pts_cross, false_)
    tt_circle = V.threat_type(tables, pts_circle, jnp.ones((bsz, h, w), bool))

    empty = board == 0

    def one_hot_threats(tt):
        # ThreatType codes OPEN_3(2)..FIVE(8) -> one-hot [..., 7]; only
        # EMPTY cells carry threats, matching the reference's
        # ThreatHistogram spot lists (reference: "tt - 2" indexing over
        # histogram locations, NNUE.cpp:141-150)
        idx = tt - T.TT_OPEN_3
        oh = jax.nn.one_hot(jnp.clip(idx, 0, 6), 7, dtype=jnp.float32)
        valid = (idx >= 0) & (idx <= 6) & empty
        return oh * valid[..., None].astype(jnp.float32)

    cell = jnp.concatenate(
        [
            one_hot_threats(tt_cross),
            one_hot_threats(tt_circle),
            (board == CROSS)[..., None].astype(jnp.float32),
            (board == CIRCLE)[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )  # [B, H, W, 16]
    lead = (jnp.asarray(stm) == CROSS).astype(jnp.float32)[:, None]
    return jnp.concatenate([lead, cell.reshape(bsz, h * w * CELL_FEATURES)], 1)


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


def evaluate_features(q: QuantizedNNUE, feats: jax.Array) -> jax.Array:
    """Feature rows [B, F] (from nnue_features) -> (win, draw) pairs [B, 2]."""
    wdl = jax.nn.softmax(quantized_apply(q, feats), -1)
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


def train_from_replay(
    tables,
    boards: jax.Array,
    stm: jax.Array,
    value_wdl: jax.Array,
    steps: int = 500,
    hidden: int = 32,
    lr: float = 1e-2,
    seed: int = 0,
) -> tuple[QuantizedNNUE, float]:
    """Fit + quantize an NNUE on replay positions (reference: TrainingNNUE
    trained on game positions then dumped to quantized weights,
    NNUE.cpp:100-230).  Returns (quantized net, final loss)."""
    feats = nnue_features(tables, boards, stm)
    variables, loss = train_nnue(feats, value_wdl, steps, hidden, lr, seed)
    return quantize(variables), loss


# ---------------------------------------------------------------------------
# Policy NNUE (reference: TrainingNNUE_policy, NNUE.cpp:290-379 — a tiny
# conv net over per-cell threat planes producing a move distribution, the
# policy counterpart used for solver move ordering)
# ---------------------------------------------------------------------------


def nnue_policy_planes(tables, board: jax.Array, stm: jax.Array) -> jax.Array:
    """[B, H, W] board + [B] stm -> [B, H, W, 16] f32 planes with the
    reference's STM-RELATIVE layout (NNUE.cpp:337-361 packInputData):
    opponent ThreatType one-hot OPEN_3..FIVE at [0..6], own at [7..13],
    opponent stone at [14], own stone at [15]."""
    from ..game.types import CROSS, GameRules
    from ..game import vectorized as V
    from ..patterns import bitwise
    from ..patterns import tables as T

    board = jnp.asarray(board)
    bsz, h, w = board.shape
    wins = jnp.moveaxis(V.windows_all(board), 1, -1)  # [B, H, W, 4]
    pts_cross, pts_circle = bitwise.classify(wins, GameRules(tables.rules))
    false_ = jnp.zeros((bsz, h, w), bool)
    tt_cross = V.threat_type(tables, pts_cross, false_)
    tt_circle = V.threat_type(tables, pts_circle, jnp.ones((bsz, h, w), bool))
    empty = board == 0
    stm_is_cross = (jnp.asarray(stm) == CROSS)[:, None, None]

    def one_hot_threats(tt):
        idx = tt - T.TT_OPEN_3
        oh = jax.nn.one_hot(jnp.clip(idx, 0, 6), 7, dtype=jnp.float32)
        valid = (idx >= 0) & (idx <= 6) & empty
        return oh * valid[..., None].astype(jnp.float32)

    oh_cross = one_hot_threats(tt_cross)
    oh_circle = one_hot_threats(tt_circle)
    own = jnp.where(stm_is_cross[..., None], oh_cross, oh_circle)
    opp = jnp.where(stm_is_cross[..., None], oh_circle, oh_cross)
    own_stone = jnp.where(stm_is_cross, board == CROSS, board == 2)
    opp_stone = jnp.where(stm_is_cross, board == 2, board == CROSS)
    return jnp.concatenate(
        [
            opp, own,
            opp_stone[..., None].astype(jnp.float32),
            own_stone[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )  # [B, H, W, 16]


class NNUEPolicyModel(nn.Module):
    """fp32 policy model (reference graph, NNUE.cpp:310-326: Conv 5x5
    no-bias + BN relu, 1x1 no-bias + BN relu middle layers, final 1x1 to
    one logit per cell; softmax lives in the loss)."""

    arch: tuple = (32, 32, 1)

    @nn.compact
    def __call__(self, planes: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.arch[0], (5, 5), use_bias=False)(planes)
        x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 use_scale=False)(x))
        for width in self.arch[1:-1]:
            x = nn.Conv(width, (1, 1), use_bias=False)(x)
            x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     use_scale=False)(x))
        x = nn.Conv(1, (1, 1))(x)
        return x[..., 0]  # [B, H, W] logits


def train_nnue_policy(
    tables,
    boards: jax.Array,
    stm: jax.Array,
    policy_targets: jax.Array,
    steps: int = 300,
    arch: tuple = (32, 32, 1),
    lr: float = 1e-3,
    seed: int = 0,
):
    """Fit the policy NNUE to visit-distribution targets [B, H, W]
    (reference: TrainingNNUE_policy with CrossEntropyLoss + RAdam,
    NNUE.cpp:326-335).  Returns (variables, final_loss)."""
    import optax

    planes = nnue_policy_planes(tables, boards, stm)
    model = NNUEPolicyModel(arch)
    variables = model.init(jax.random.PRNGKey(seed), planes[:1], train=True)
    tx = optax.radam(lr)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    opt = tx.init(params)
    bsz = planes.shape[0]
    tgt = policy_targets.reshape(bsz, -1)

    @jax.jit
    def step(params, batch_stats, opt):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, planes, train=True,
                mutable=["batch_stats"],
            )
            lp = jax.nn.log_softmax(logits.reshape(bsz, -1), -1)
            return -(tgt * lp).sum(-1).mean(), upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt)
        return optax.apply_updates(params, updates), new_bs, opt2, loss

    loss = None
    for _ in range(steps):
        params, batch_stats, opt, loss = step(params, batch_stats, opt)
    return {"params": params, "batch_stats": batch_stats}, float(loss)
