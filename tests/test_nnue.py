"""NNUE quantized evaluator tests: reference featurization layout
(per-cell threat/stone one-hots, NNUE.cpp:134-155), train -> quantize
agreement, and the search-integration flag (reference capability:
networks/NNUE + nnue_ops quantized inference; solver hooks
AlphaBetaSearch.hpp:57,62)."""

import jax
import jax.numpy as jnp
import numpy as np

from alphagomoku_tpu.game.types import CROSS, CIRCLE, GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import nnue
from alphagomoku_tpu.patterns import tables as T

H = W = 9


def _random_boards(n, seed=0):
    rng = np.random.default_rng(seed)
    boards = np.zeros((n, H, W), np.int8)
    for b in range(n):
        k = rng.integers(0, 30)
        cells = rng.choice(H * W, size=k, replace=False)
        boards[b].flat[cells] = np.where(np.arange(k) % 2 == 0, CROSS, CIRCLE)
    stm = np.where(rng.random(n) < 0.5, CROSS, CIRCLE).astype(np.int8)
    return jnp.asarray(boards), jnp.asarray(stm)


def test_feature_layout_matches_reference():
    """Reference layout (NNUE.cpp:134-155): [0] = cross-to-move, then per
    cell 16 features: cross threats OPEN_3..FIVE one-hot, circle threats,
    stone one-hot."""
    tables = V.device_tables(GameRules.FREESTYLE)
    boards = np.zeros((2, H, W), np.int8)
    # an open three for cross: threat OPEN_3 at the extension cells
    boards[0, 4, 3:6] = CROSS
    stm = jnp.asarray([CROSS, CIRCLE], jnp.int8)
    feats = np.asarray(nnue.nnue_features(tables, jnp.asarray(boards), stm))
    assert feats.shape == (2, nnue.num_features(H, W))
    assert feats[0, 0] == 1.0 and feats[1, 0] == 0.0  # side to move
    # stone one-hots land at cell*16 + 14 (cross)
    cell = 4 * W + 4
    assert feats[0, 1 + cell * 16 + 14] == 1.0
    assert feats[0, 1 + cell * 16 + 15] == 0.0
    # the extension cell (4,2) of an open three is an OPEN_4 threat for
    # cross -> one-hot index (OPEN_4=7) - (OPEN_3=2) = 5
    ext = 4 * W + 2
    assert feats[0, 1 + ext * 16 + 5] == 1.0
    # occupied cells carry NO threat features (reference: ThreatHistogram
    # lists empty spots only)
    assert feats[0, 1 + cell * 16 : 1 + cell * 16 + 14].sum() == 0.0
    # empty board has no threat features at all
    assert feats[1, 1:].sum() == 0.0
    # every cell block is a valid set of one-hots
    cells = feats[0, 1:].reshape(H * W, 16)
    assert ((cells[:, 0:7].sum(-1) <= 1) & (cells[:, 7:14].sum(-1) <= 1)).all()


def test_train_and_quantize_agreement():
    tables = V.device_tables(GameRules.FREESTYLE)
    boards, stm = _random_boards(256, seed=1)
    feats = nnue.nnue_features(tables, boards, stm)
    f = np.asarray(feats)
    # synthetic learnable target: cross threat mass vs circle threat mass
    cells = f[:, 1:].reshape(f.shape[0], -1, 16)
    margin = (cells[:, :, 0:7].sum((1, 2)) - cells[:, :, 7:14].sum((1, 2))) / 4.0
    win = 1 / (1 + np.exp(-margin))
    targets = jnp.asarray(
        np.stack([win, np.full_like(win, 0.05), 1 - win - 0.05], -1)
    )
    variables, _ = nnue.train_nnue(feats, targets, steps=300)
    model = nnue.NNUEModel()
    fp_logits = np.asarray(model.apply(variables, feats))

    q = nnue.quantize(variables)
    q_logits = np.asarray(nnue.quantized_apply(q, feats))
    agree = (fp_logits.argmax(-1) == q_logits.argmax(-1)).mean()
    assert agree > 0.85, agree
    # quantized logits track fp32 closely in value too
    corr_fp = np.corrcoef(fp_logits[:, 0], q_logits[:, 0])[0, 1]
    assert corr_fp > 0.98, corr_fp
    pred_win = jax.nn.softmax(jnp.asarray(q_logits), -1)[:, 0]
    corr = np.corrcoef(np.asarray(pred_win), win)[0, 1]
    assert corr > 0.7, corr


def test_nnue_changes_search_values():
    """The nnue flag must measurably change search behavior (VERDICT task 9:
    'a flag that changes search behavior measurably')."""
    from alphagomoku_tpu.models import create_network
    from alphagomoku_tpu.search import mcts

    tables = V.device_tables(GameRules.FREESTYLE)
    boards, stm = _random_boards(4, seed=3)
    wdl = jnp.tile(jnp.asarray([[0.8, 0.1, 0.1]]), (4, 1))
    q, _ = nnue.train_from_replay(tables, boards, stm, wdl, steps=50)

    net = create_network("FastPolicy", blocks=1, filters=8)
    x = jnp.zeros((1, H, W, net.cfg.input_planes), jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    apply = lambda v, p: net.apply(v, p, train=False)
    cfg = mcts.MCTSConfig(max_nodes=32, max_edges=16, max_depth=6)

    base = jax.jit(
        lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, 12)
    )(variables, boards, stm)
    blended = jax.jit(
        lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, 12, nnue=q)
    )(variables, boards, stm)
    v0 = np.asarray(mcts.root_value(base))
    v1 = np.asarray(mcts.root_value(blended))
    assert np.isfinite(v1).all()
    assert not np.allclose(v0, v1), "nnue blending must change root values"


def test_policy_nnue_layout_and_training():
    """Policy NNUE (reference: TrainingNNUE_policy, NNUE.cpp:290-379):
    stm-relative plane layout + loss decreases on a tiny fit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from alphagomoku_tpu.game.types import CROSS, CIRCLE, GameRules
    from alphagomoku_tpu.game import vectorized as V
    from alphagomoku_tpu.models import nnue as N

    tables = V.device_tables(GameRules.FREESTYLE)
    H = W = 9
    b = np.zeros((1, H, W), np.int8)
    b[0, 4, 2:5] = CROSS  # cross open three
    b[0, 0, 0] = CIRCLE

    pl_x = np.asarray(N.nnue_policy_planes(tables, jnp.asarray(b),
                                           jnp.asarray([CROSS], jnp.int8)))[0]
    pl_o = np.asarray(N.nnue_policy_planes(tables, jnp.asarray(b),
                                           jnp.asarray([CIRCLE], jnp.int8)))[0]
    # cross to move: cross threats are OWN (channels 7..13); the open-three
    # promotion cells (4,1)/(4,5) carry OPEN_4 threat class for cross
    own_any_x = pl_x[..., 7:14].sum(-1)
    opp_any_x = pl_x[..., 0:7].sum(-1)
    assert own_any_x.sum() > 0 and opp_any_x.sum() == 0
    # circle to move: the same planes flip to OPPONENT channels
    assert np.allclose(pl_o[..., 0:7], pl_x[..., 7:14])
    assert np.allclose(pl_o[..., 7:14], pl_x[..., 0:7])
    # stones: own at 15, opp at 14
    assert pl_x[4, 2, 15] == 1.0 and pl_x[0, 0, 14] == 1.0
    assert pl_o[4, 2, 14] == 1.0 and pl_o[0, 0, 15] == 1.0

    # tiny fit: target = uniform over the three promotion cells
    tgt = np.zeros((1, H, W), np.float32)
    tgt[0, 4, 1] = tgt[0, 4, 5] = 0.5
    _vars, loss = N.train_nnue_policy(
        tables, jnp.asarray(b), jnp.asarray([CROSS], jnp.int8),
        jnp.asarray(tgt), steps=60, arch=(16, 1), lr=3e-3,
    )
    assert np.isfinite(loss)
    assert loss < 4.0  # well below uniform log(81) ~ 4.39
