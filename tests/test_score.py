"""Packed Score arithmetic tests, replaying the semantics covered by the
reference's test/search/test_Score.cpp."""

import numpy as np
import jax.numpy as jnp

from alphagomoku_tpu.game.types import CROSS, CIRCLE, GameOutcome
from alphagomoku_tpu.search import score as S


def s(x):
    return int(np.asarray(x))


def test_packing_layout():
    # uint16 = pv << 13 | (4000 + eval)  (reference: Score.hpp:49-68)
    assert s(S.make(S.PV_UNKNOWN, 0)) == (2 << 13) | 4000
    assert s(S.make(S.PV_WIN, -5)) == (3 << 13) | 3995
    assert s(S.get_eval(S.make(S.PV_UNKNOWN, 123))) == 123
    assert s(S.get_pv(S.win_in(3))) == S.PV_WIN
    assert s(S.get_distance(S.win_in(3))) == 3
    assert s(S.get_distance(S.loss_in(7))) == 7
    assert s(S.get_distance(S.draw_in(2))) == 2


def test_ordering():
    # the packing is ordered: LOSS < DRAW < UNKNOWN < WIN; within WIN closer
    # mates sort higher (reference: Score.hpp comparison operators on m_data)
    assert s(S.loss_in(1)) < s(S.draw_in(1)) < s(S.eval_score(0)) < s(S.win_in(9))
    assert s(S.win_in(3)) > s(S.win_in(5))  # faster win is better
    assert s(S.loss_in(5)) > s(S.loss_in(3))  # slower loss is better
    assert s(S.eval_score(100)) > s(S.eval_score(-100))
    assert np.uint16(S.MINUS_INF) < s(S.loss_in(0))
    assert np.uint16(S.PLUS_INF) > s(S.win_in(0))


def test_negation():
    assert s(S.neg(S.win_in(4))) == s(S.loss_in(4))
    assert s(S.neg(S.loss_in(4))) == s(S.win_in(4))
    assert s(S.neg(S.draw_in(2))) == s(S.draw_in(2))
    assert s(S.neg(S.eval_score(250))) == s(S.eval_score(-250))
    assert s(S.neg(jnp.asarray(S.MINUS_INF))) == S.PLUS_INF
    assert s(S.neg(jnp.asarray(S.PLUS_INF))) == S.MINUS_INF


def test_invert_up_down():
    # (reference: Score.hpp:285-317)
    assert s(S.invert_up(S.loss_in(3))) == s(S.win_in(4))
    assert s(S.invert_up(S.win_in(3))) == s(S.loss_in(4))
    assert s(S.invert_up(S.draw_in(3))) == s(S.draw_in(4))
    assert s(S.invert_up(S.eval_score(77))) == s(S.eval_score(-77))
    assert s(S.invert_down(S.win_in(4))) == s(S.loss_in(3))
    assert s(S.invert_down(S.loss_in(4))) == s(S.win_in(3))


def test_predicates():
    assert bool(np.asarray(S.is_win(S.win_in(1))))
    assert not bool(np.asarray(S.is_win(S.loss_in(1))))
    assert bool(np.asarray(S.is_proven(S.draw_in(0))))
    assert not bool(np.asarray(S.is_proven(S.eval_score(5))))
    assert not bool(np.asarray(S.is_proven(jnp.asarray(S.PLUS_INF))))
    assert bool(np.asarray(S.is_infinite(jnp.asarray(S.MINUS_INF))))


def test_convert_to_value():
    # (reference: Score.hpp:266-281)
    v = np.asarray(S.convert_to_value(S.win_in(2)))
    assert v[0] == 1.0 and v[1] == 0.0
    v = np.asarray(S.convert_to_value(S.loss_in(2)))
    assert v[0] == 0.0 and v[1] == 0.0
    v = np.asarray(S.convert_to_value(S.draw_in(1)))
    assert v[0] == 0.0 and v[1] == 1.0
    v = np.asarray(S.convert_to_value(S.eval_score(0)))
    assert abs(v[0] - 0.5) < 1e-6


def test_from_outcome():
    # (reference: src/search/Score.cpp:40-53)
    assert s(S.from_outcome(int(GameOutcome.CROSS_WIN), CROSS)) == s(S.win_in(0))
    assert s(S.from_outcome(int(GameOutcome.CROSS_WIN), CIRCLE)) == s(S.loss_in(0))
    assert s(S.from_outcome(int(GameOutcome.CIRCLE_WIN), CIRCLE)) == s(S.win_in(0))
    assert s(S.from_outcome(int(GameOutcome.DRAW), CROSS)) == s(S.draw_in(0))
    assert s(S.from_outcome(int(GameOutcome.UNKNOWN), CROSS)) == s(S.zero())


def test_value_ops():
    v = jnp.asarray([0.6, 0.2])
    assert abs(float(S.value_expectation(v)) - 0.7) < 1e-6
    vi = np.asarray(S.value_invert(v))
    assert abs(vi[0] - 0.2) < 1e-6 and abs(vi[1] - 0.2) < 1e-6
