"""Packed 16-bit solver scores and (win, draw) values, fully vectorized.

Bit-exact re-expression of the reference's `Score`
(reference: include/alphagomoku/search/Score.hpp:47-331): uint16 =
3-bit ProvenValue {LOSS=0, DRAW=1, UNKNOWN=2, WIN=3} << 13 | (4000 + eval),
eval in [-4000, 4000].  The packing is ordered, so minimax comparisons are
plain unsigned compares — ideal for batched argmax on TPU.  Distance-to-mate
arithmetic: WIN stores eval = -plys (closer win sorts higher), LOSS/DRAW
store eval = +plys.

All functions take/return jnp uint16/int32 arrays of any shape and are
jit/vmap-compatible.  `tests/test_score.py` replays the reference's
`test/search/test_Score.cpp` semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..game.types import CROSS, CIRCLE, GameOutcome

# ProvenValue codes (reference: Score.hpp:26-32 enum order)
PV_LOSS = 0
PV_DRAW = 1
PV_UNKNOWN = 2
PV_WIN = 3

MINUS_INF = np.uint16(0x0000)
PLUS_INF = np.uint16(0xFFFF)

_U16 = jnp.uint16


def make(pv, evaluation) -> jax.Array:
    """Score from ProvenValue + eval (reference: Score ctor)."""
    pv = jnp.asarray(pv, jnp.int32)
    evaluation = jnp.asarray(evaluation, jnp.int32)
    return ((pv << 13) | (4000 + evaluation)).astype(_U16)


def zero():
    return make(PV_UNKNOWN, 0)


def eval_score(evaluation):
    return make(PV_UNKNOWN, evaluation)


def win_in(plys):
    return make(PV_WIN, -jnp.asarray(plys, jnp.int32))


def loss_in(plys):
    return make(PV_LOSS, jnp.asarray(plys, jnp.int32))


def draw_in(plys):
    return make(PV_DRAW, jnp.asarray(plys, jnp.int32))


def get_eval(s) -> jax.Array:
    return (jnp.asarray(s, jnp.int32) & 8191) - 4000


def get_pv(s) -> jax.Array:
    return jnp.asarray(s, jnp.int32) >> 13


def is_infinite(s) -> jax.Array:
    s = jnp.asarray(s, jnp.uint16)
    return (s == MINUS_INF) | (s == PLUS_INF)


def is_finite(s) -> jax.Array:
    return ~is_infinite(s)


def is_proven(s) -> jax.Array:
    return (get_pv(s) != PV_UNKNOWN) & is_finite(s)


def is_win(s) -> jax.Array:
    return (get_pv(s) == PV_WIN) & is_finite(s)


def is_loss(s) -> jax.Array:
    return (get_pv(s) == PV_LOSS) & is_finite(s)


def is_draw(s) -> jax.Array:
    return get_pv(s) == PV_DRAW


def get_distance(s) -> jax.Array:
    """Plies to the proven result (reference: Score.hpp getDistance)."""
    pv = get_pv(s)
    ev = get_eval(s)
    return jnp.where(pv == PV_WIN, -ev, jnp.where(pv == PV_UNKNOWN, 0, ev))


def neg(s) -> jax.Array:
    """Unary minus (reference: Score.hpp operator-): swaps WIN/LOSS keeping
    |eval|; infinities swap."""
    pv = get_pv(s)
    ev = get_eval(s)
    inf = is_infinite(s)
    new_pv = jnp.where(pv == PV_WIN, PV_LOSS, jnp.where(pv == PV_LOSS, PV_WIN, pv))
    new_ev = jnp.where(pv == PV_DRAW, ev, -ev)
    out = make(new_pv, new_ev)
    s16 = jnp.asarray(s, jnp.uint16)
    return jnp.where(inf, jnp.where(s16 == MINUS_INF, PLUS_INF, MINUS_INF), out)


def add_int(s, i) -> jax.Array:
    """score + int on the eval field; infinities unchanged
    (reference: Score.hpp operator+(Score, int))."""
    out = make(get_pv(s), get_eval(s) + jnp.asarray(i, jnp.int32))
    return jnp.where(is_infinite(s), jnp.asarray(s, jnp.uint16), out)


def increase_distance(s, i=1) -> jax.Array:
    """Push a proven result one ply further (reference: increaseDistance)."""
    pv = get_pv(s)
    delta = jnp.where(
        (pv == PV_LOSS) | (pv == PV_DRAW),
        jnp.asarray(i, jnp.int32),
        jnp.where(pv == PV_WIN, -jnp.asarray(i, jnp.int32), 0),
    )
    return add_int(s, delta)


def invert_up(s) -> jax.Array:
    """Invert to the parent's perspective, one ply up
    (reference: Score.hpp:285-301): LOSS in d -> WIN in d+1, WIN in d ->
    LOSS in d+1, DRAW in d -> DRAW in d+1, UNKNOWN(e) -> UNKNOWN(-e)."""
    return increase_distance(neg(s), 1)


def invert_down(s) -> jax.Array:
    """(reference: Score.hpp:303-317)"""
    return increase_distance(neg(s), -1)


def convert_to_value(s) -> jax.Array:
    """Score -> (win_rate, draw_rate) float pair stacked on the last axis
    (reference: Score.hpp:266-281 convertToValue)."""
    pv = get_pv(s)
    ev = get_eval(s)
    fin = is_finite(s)
    win = jnp.where(
        pv == PV_WIN,
        jnp.where(fin, 1.0, 0.0),
        jnp.where(pv == PV_UNKNOWN, (1000.0 + ev) / 2000.0, 0.0),
    ).astype(jnp.float32)
    draw = jnp.where(pv == PV_DRAW, 1.0, 0.0).astype(jnp.float32)
    return jnp.stack([win, draw], axis=-1)


def from_outcome(outcome, sign_to_move, distance=0) -> jax.Array:
    """GameOutcome + side to move -> proven Score
    (reference: src/search/Score.cpp:40-53 convertProvenValue)."""
    outcome = jnp.asarray(outcome, jnp.int32)
    stm = jnp.asarray(sign_to_move, jnp.int32)
    win = ((outcome == int(GameOutcome.CROSS_WIN)) & (stm == CROSS)) | (
        (outcome == int(GameOutcome.CIRCLE_WIN)) & (stm == CIRCLE)
    )
    loss = ((outcome == int(GameOutcome.CROSS_WIN)) & (stm == CIRCLE)) | (
        (outcome == int(GameOutcome.CIRCLE_WIN)) & (stm == CROSS)
    )
    draw = outcome == int(GameOutcome.DRAW)
    pv = jnp.where(win, PV_WIN, jnp.where(loss, PV_LOSS, jnp.where(draw, PV_DRAW, PV_UNKNOWN)))
    ev = jnp.where(
        win, -jnp.asarray(distance, jnp.int32),
        jnp.where(loss | draw, jnp.asarray(distance, jnp.int32), 0),
    )
    return make(pv, ev)


# ---------------------------------------------------------------------------
# Value = (win_rate, draw_rate) pairs on the last axis
# (reference: include/alphagomoku/search/Value.hpp)
# ---------------------------------------------------------------------------


def value_expectation(value) -> jax.Array:
    """w + 0.5*d (reference: Value.hpp:41-44 getExpectation)."""
    return value[..., 0] + 0.5 * value[..., 1]


def value_invert(value) -> jax.Array:
    """Opponent's view: win' = 1 - win - draw (reference: Value.hpp
    getInverted)."""
    return jnp.stack(
        [1.0 - value[..., 0] - value[..., 1], value[..., 1]], axis=-1
    )
