"""NNUE-style quantized evaluator tests (reference capability:
networks/NNUE + nnue_ops quantized inference)."""

import jax
import jax.numpy as jnp
import numpy as np

from alphagomoku_tpu.game.types import CROSS, CIRCLE, GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import nnue
from alphagomoku_tpu.patterns import features as F


def _random_packed(n, seed=0, h=9, w=9):
    rng = np.random.default_rng(seed)
    tables = V.device_tables(GameRules.FREESTYLE)
    boards = np.zeros((n, h, w), np.int8)
    for b in range(n):
        k = rng.integers(0, 30)
        cells = rng.choice(h * w, size=k, replace=False)
        boards[b].flat[cells] = np.where(np.arange(k) % 2 == 0, CROSS, CIRCLE)
    stm = np.where(rng.random(n) < 0.5, CROSS, CIRCLE).astype(np.int8)
    return F.encode(tables, jnp.asarray(boards), jnp.asarray(stm))


def test_threat_features_shape_and_signal():
    packed = _random_packed(16)
    feats = np.asarray(nnue.threat_features(packed))
    assert feats.shape == (16, nnue.NUM_FEATURES)
    assert np.isfinite(feats).all()
    # an empty board has zero threat counts
    tables = V.device_tables(GameRules.FREESTYLE)
    empty = F.encode(
        tables, jnp.zeros((1, 9, 9), jnp.int8), jnp.full(1, CROSS, jnp.int8)
    )
    fe = np.asarray(nnue.threat_features(empty))[0]
    assert fe[:12].sum() == 0  # no threats for either player


def test_train_and_quantize_agreement():
    packed = _random_packed(256, seed=1)
    feats = nnue.threat_features(packed)
    # learnable synthetic target: more own threats -> more winning
    f = np.asarray(feats)
    margin = f[:, 0:6].sum(-1) - f[:, 6:12].sum(-1)
    win = 1 / (1 + np.exp(-4 * margin))
    targets = jnp.asarray(
        np.stack([win, np.full_like(win, 0.05), 1 - win - 0.05], -1)
    )
    variables, loss0 = nnue.train_nnue(feats, targets, steps=300)
    model = nnue.NNUEModel()
    fp_logits = np.asarray(model.apply(variables, feats))

    q = nnue.quantize(variables)
    q_logits = np.asarray(nnue.quantized_apply(q, feats))
    # quantized network agrees with fp32 on the argmax for nearly all inputs
    agree = (fp_logits.argmax(-1) == q_logits.argmax(-1)).mean()
    assert agree > 0.95, agree
    # and it learned the synthetic signal
    pred_win = jax.nn.softmax(jnp.asarray(q_logits), -1)[:, 0]
    corr = np.corrcoef(np.asarray(pred_win), win)[0, 1]
    assert corr > 0.7, corr


def test_evaluate_packed_api():
    packed = _random_packed(8, seed=2)
    feats = nnue.threat_features(packed)
    variables, _ = nnue.train_nnue(
        feats, jnp.full((8, 3), 1 / 3), steps=10
    )
    q = nnue.quantize(variables)
    value = np.asarray(nnue.evaluate_packed(q, packed))
    assert value.shape == (8, 2)
    assert ((value >= 0) & (value <= 1)).all()
