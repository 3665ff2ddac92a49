"""Supervised/RL training step: losses, optimizer, schedules, SWA.

TPU-native counterpart of the reference training loop
(reference: src/selfplay/SupervisedLearning.cpp:94-154 losses,
src/networks/networks.cpp graph.setOptimizer(ml::RAdam(...)) optimizer,
src/selfplay/NetworkLoader.cpp:41-53 SWA averaging,
include/alphagomoku/utils/Parameter.hpp schedules).

Loss structure (reference: SupervisedLearning losses + NetworkDataPack
targets, src/networks/NetworkDataPack.cpp:131-162):
- policy: CE(visit distribution, policy logits)
- value: CE(3-way win/draw/loss target, value logits)
- action values: per-cell 3-way CE masked to visited root edges
- moves left: CE over H*W buckets, weight 0.25 (reference:
  networks.cpp:1215 addOutput(..., 0.25f))
- soft policy (T=4): CE(policy target softened at T=4), weight 8.0
  (reference: networks.cpp:1300 addOutput(..., 8.0f))
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..game import vectorized as V
from ..patterns import features as F
from ..models.networks import AGNetwork, NetOutput
from ..utils import augment


class TrainConfig(NamedTuple):
    learning_rate: float = 1e-3
    l2_regularization: float = 1e-4  # (reference: TrainingConfig)
    moves_left_weight: float = 0.25
    soft_policy_weight: float = 8.0
    soft_policy_temperature: float = 4.0
    q_weight: float = 1.0
    augment_symmetries: bool = True


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def create_train_state(
    net: AGNetwork, variables: Any, cfg: TrainConfig, lr_schedule=None
) -> tuple[TrainState, optax.GradientTransformation]:
    """RAdam optimizer with decoupled weight decay (reference uses
    ml::RAdam(lr, 0.9, 0.999, l2), networks.cpp:1218)."""
    tx = optax.chain(
        optax.add_decayed_weights(cfg.l2_regularization),
        optax.radam(lr_schedule if lr_schedule is not None else cfg.learning_rate),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return (
        TrainState(params, batch_stats, tx.init(params), jnp.zeros((), jnp.int32)),
        tx,
    )


def _losses(out: NetOutput, batch: dict, cfg: TrainConfig, legal: jax.Array):
    """Per-head scalar losses over valid samples."""
    valid = batch["valid"].astype(jnp.float32)
    denom = jnp.maximum(valid.sum(), 1.0)
    bsz = valid.shape[0]
    hw = out.policy_logits.shape[1] * out.policy_logits.shape[2]

    neg = jnp.float32(-1e9)
    plog = jnp.where(legal, out.policy_logits, neg).reshape(bsz, hw)
    logp = jax.nn.log_softmax(plog, -1)
    ptarget = batch["policy"].reshape(bsz, hw)
    policy_loss = -(ptarget * logp).sum(-1)
    policy_loss = (policy_loss * valid).sum() / denom

    vlogp = jax.nn.log_softmax(out.value_logits, -1)
    value_loss = -(batch["value_wdl"] * vlogp).sum(-1)
    value_loss = (value_loss * valid).sum() / denom

    total = policy_loss + value_loss
    parts = {"policy": policy_loss, "value": value_loss}

    if out.q_logits is not None:
        qt = batch["q_value"]  # [B, H, W, 2] (win, draw)
        q_wdl = jnp.stack(
            [qt[..., 0], qt[..., 1], 1.0 - qt[..., 0] - qt[..., 1]], -1
        )
        qlogp = jax.nn.log_softmax(out.q_logits, -1)
        qm = batch["q_mask"].astype(jnp.float32) * valid[:, None, None]
        q_loss = -((q_wdl * qlogp).sum(-1) * qm).sum() / jnp.maximum(qm.sum(), 1.0)
        total = total + cfg.q_weight * q_loss
        parts["q"] = q_loss

    if out.moves_left_logits is not None:
        mt = jax.nn.one_hot(batch["moves_left"], out.moves_left_logits.shape[-1])
        mlogp = jax.nn.log_softmax(out.moves_left_logits, -1)
        m_loss = -(mt * mlogp).sum(-1)
        m_loss = (m_loss * valid).sum() / denom
        total = total + cfg.moves_left_weight * m_loss
        parts["moves_left"] = m_loss

    if out.soft_policy_logits is not None:
        # T=4 softened target (reference: NetworkDataPack.cpp:149-161)
        t = cfg.soft_policy_temperature
        soft = ptarget ** (1.0 / t)
        soft = soft / jnp.maximum(soft.sum(-1, keepdims=True), 1e-12)
        slog = jnp.where(legal, out.soft_policy_logits, neg).reshape(bsz, hw)
        slogp = jax.nn.log_softmax(slog, -1)
        s_loss = -(soft * slogp).sum(-1)
        s_loss = (s_loss * valid).sum() / denom
        total = total + cfg.soft_policy_weight * s_loss
        parts["soft_policy"] = s_loss

    parts["total"] = total
    return total, parts


def make_train_step(
    net: AGNetwork,
    tx: optax.GradientTransformation,
    tables: V.RuleTables,
    cfg: TrainConfig,
):
    """Build the jittable train step over a batch of samples from
    selfplay.make_targets.  Features are re-encoded on device from raw
    boards, with per-sample random symmetry augmentation
    (reference: SupervisedLearning.cpp:37-46)."""

    raw = net.cfg.raw_input

    def train_step(state: TrainState, batch: dict, key: jax.Array):
        board = batch["board"]
        bsz, h, w = board.shape

        packed = F.encode(tables, board, batch["stm"])
        policy_t = batch["policy"]
        q_value = batch["q_value"]
        q_mask = batch["q_mask"]
        if cfg.augment_symmetries:
            modes = jax.random.randint(key, (bsz,), 0, 8 if h == w else 4)
            packed = F.augment_features_batch(packed, modes)
            policy_t = augment.apply_symmetry_batch(policy_t, modes)
            q_value = augment.apply_symmetry_batch(
                jnp.moveaxis(q_value, -1, 1), modes
            )
            q_value = jnp.moveaxis(q_value, 1, -1)
            q_mask = augment.apply_symmetry_batch(q_mask, modes)
        planes = F.unpack_raw_planes(packed) if raw else F.unpack_planes(packed)
        legal = ((packed & 1) == 1) & ~(((packed >> 6) & 1) == 1)
        aug_batch = dict(batch, policy=policy_t, q_value=q_value, q_mask=q_mask)

        def loss_fn(params):
            out, mutated = net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                planes,
                train=True,
                mutable=["batch_stats"],
            )
            total, parts = _losses(out, aug_batch, cfg, legal)
            return total, (parts, mutated["batch_stats"])

        (loss, (parts, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_bs, new_opt, state.step + 1)
        return new_state, parts

    return train_step


def make_eval_step(net: AGNetwork, tables: V.RuleTables, cfg: TrainConfig):
    """Validation pass: losses + top-k policy accuracy, no gradients
    (reference: SupervisedLearning validation + accuracy history,
    SupervisedLearning.cpp:231-304)."""
    raw = net.cfg.raw_input

    def eval_step(state: TrainState, batch: dict):
        board = batch["board"]
        packed = F.encode(tables, board, batch["stm"])
        planes = F.unpack_raw_planes(packed) if raw else F.unpack_planes(packed)
        legal = ((packed & 1) == 1) & ~(((packed >> 6) & 1) == 1)
        out = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            planes,
            train=False,
        )
        _, parts = _losses(out, batch, cfg, legal)

        bsz = board.shape[0]
        hw = out.policy_logits.shape[1] * out.policy_logits.shape[2]
        plog = jnp.where(legal, out.policy_logits, -1e9).reshape(bsz, hw)
        target_best = jnp.argmax(batch["policy"].reshape(bsz, hw), -1)
        valid = batch["valid"].astype(jnp.float32)
        denom = jnp.maximum(valid.sum(), 1.0)
        for k in (1, 3, 5):
            _, topk = jax.lax.top_k(plog, k)
            hit = jnp.any(topk == target_best[:, None], -1).astype(jnp.float32)
            parts[f"top{k}_accuracy"] = (hit * valid).sum() / denom
        return parts

    return eval_step


def make_distill_step(
    student: AGNetwork,
    teacher: AGNetwork,
    tx: optax.GradientTransformation,
    tables: V.RuleTables,
    cfg: TrainConfig,
):
    """Teacher -> student distillation step: the student is trained toward
    the teacher's output distributions on the sampled positions
    (reference: SupervisedLearning distillation variant,
    SupervisedLearning.cpp:155-230)."""
    raw_s = student.cfg.raw_input
    raw_t = teacher.cfg.raw_input

    def distill_step(
        state: TrainState, teacher_variables: Any, batch: dict, key: jax.Array
    ):
        board = batch["board"]
        bsz, h, w = board.shape
        packed = F.encode(tables, board, batch["stm"])
        if cfg.augment_symmetries:
            modes = jax.random.randint(key, (bsz,), 0, 8 if h == w else 4)
            packed = F.augment_features_batch(packed, modes)
        planes_s = F.unpack_raw_planes(packed) if raw_s else F.unpack_planes(packed)
        planes_t = F.unpack_raw_planes(packed) if raw_t else F.unpack_planes(packed)
        legal = ((packed & 1) == 1) & ~(((packed >> 6) & 1) == 1)

        t_out = teacher.apply(teacher_variables, planes_t, train=False)
        neg = jnp.float32(-1e9)
        t_policy = jax.nn.softmax(
            jnp.where(legal, t_out.policy_logits, neg).reshape(bsz, -1), -1
        )
        t_value = jax.nn.softmax(t_out.value_logits, -1)

        def loss_fn(params):
            out, mutated = student.apply(
                {"params": params, "batch_stats": state.batch_stats},
                planes_s,
                train=True,
                mutable=["batch_stats"],
            )
            s_logp = jax.nn.log_softmax(
                jnp.where(legal, out.policy_logits, neg).reshape(bsz, -1), -1
            )
            policy_loss = -(t_policy * s_logp).sum(-1).mean()
            v_logp = jax.nn.log_softmax(out.value_logits, -1)
            value_loss = -(t_value * v_logp).sum(-1).mean()
            total = policy_loss + value_loss
            if out.q_logits is not None and t_out.q_logits is not None:
                t_q = jax.nn.softmax(t_out.q_logits, -1)
                q_logp = jax.nn.log_softmax(out.q_logits, -1)
                total = total + cfg.q_weight * (-(t_q * q_logp).sum(-1).mean())
            parts = {"policy": policy_loss, "value": value_loss, "total": total}
            return total, (parts, mutated["batch_stats"])

        (loss, (parts, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_bs, new_opt, state.step + 1), parts

    return distill_step


# ---------------------------------------------------------------------------
# Parameter schedules (reference: utils/Parameter.hpp epoch-keyed values with
# none/linear/cosine interpolation)
# ---------------------------------------------------------------------------


def schedule(points: list[tuple[int, float]], interpolation: str = "linear"):
    """Epoch-keyed schedule -> f(step) (host + device callable)."""
    xs = np.asarray([p[0] for p in points], np.float32)
    ys = np.asarray([p[1] for p in points], np.float32)

    def f(step):
        step = jnp.asarray(step, jnp.float32)
        if interpolation == "none":
            idx = jnp.clip(jnp.searchsorted(xs, step, side="right") - 1, 0, len(xs) - 1)
            return ys[idx]
        val = jnp.interp(step, xs, ys)
        if interpolation == "cosine":
            # cosine easing between the same keypoints
            idx = jnp.clip(jnp.searchsorted(xs, step, side="right") - 1, 0, len(xs) - 2)
            x0, x1 = xs[idx], xs[idx + 1]
            y0, y1 = ys[idx], ys[idx + 1]
            t = jnp.clip((step - x0) / jnp.maximum(x1 - x0, 1e-9), 0.0, 1.0)
            return y0 + (y1 - y0) * (1.0 - jnp.cos(jnp.pi * t)) / 2.0
        return val

    return f


# ---------------------------------------------------------------------------
# SWA (reference: NetworkLoader::get averaging via ml::averageModelWeights)
# ---------------------------------------------------------------------------


def average_params(params_list: list[Any]) -> Any:
    """Uniform weight average of pytrees (stochastic weight averaging over
    the last k checkpoints, reference: TrainingManager.cpp:270-272)."""
    n = len(params_list)
    return jax.tree_util.tree_map(lambda *xs: sum(xs) / n, *params_list)
