"""Game wrapper, PGN, openings tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alphagomoku_tpu.game.game import Game
from alphagomoku_tpu.game.types import CROSS, CIRCLE, GameOutcome, GameRules, Move
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.selfplay.openings import (
    generate_balanced_openings,
    propose_random_openings,
)


def test_game_flow():
    g = Game(GameRules.FREESTYLE, 15, 15)
    assert g.sign_to_move() == CROSS
    for i, (r, c) in enumerate([(7, 7), (8, 8), (7, 8), (8, 9), (7, 9), (8, 10)]):
        g.make_move(Move(row=r, col=c, sign=g.sign_to_move()))
    assert not g.is_over()
    g.undo_move()
    assert g.number_of_moves() == 5
    # cross completes five: 7,5 7,6 7,7 7,8 7,9 -> needs 7,6 and 7,5
    g.make_move(Move(row=8, col=10, sign=CIRCLE))
    g.make_move(Move(row=7, col=6, sign=CROSS))
    g.make_move(Move(row=0, col=0, sign=CIRCLE))
    g.make_move(Move(row=7, col=5, sign=CROSS))  # completes 7,5..7,9
    assert g.outcome == GameOutcome.CROSS_WIN
    with pytest.raises(AssertionError):
        g.make_move(Move(row=1, col=1, sign=CIRCLE))


def test_game_pgn_and_json(tmp_path):
    g = Game(GameRules.STANDARD, 15, 15)
    g.cross_name = "a"
    g.circle_name = "b"
    g.make_move(Move(row=7, col=7, sign=CROSS))
    g.make_move(Move(row=8, col=8, sign=CIRCLE))
    pgn = g.generate_pgn()
    assert '[White "a"]' in pgn and "1. Xh7 Oi8" in pgn and pgn.endswith("*")
    path = str(tmp_path / "game.json")
    g.save(path)
    g2 = Game.load(path)
    assert g2.moves == g.moves
    assert g2.rules == g.rules
    assert g2.outcome == GameOutcome.UNKNOWN


def test_propose_openings():
    boards = np.asarray(propose_random_openings(jax.random.PRNGKey(0), 16, 15, 15, 4))
    counts = (boards != 0).sum((1, 2))
    assert (counts == 4).all()  # exactly 4 stones, no collisions lost
    cross = (boards == CROSS).sum((1, 2))
    circle = (boards == CIRCLE).sum((1, 2))
    assert (cross == 2).all() and (circle == 2).all()


def test_balanced_openings():
    from alphagomoku_tpu.models import create_network

    net = create_network("FastPolicy", blocks=1, filters=8)
    x = jnp.zeros((1, 9, 9, net.cfg.input_planes), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    tables = V.device_tables(GameRules.FREESTYLE)
    apply = lambda v, p: net.apply(v, p, train=False)
    boards = generate_balanced_openings(
        apply, variables, tables, jax.random.PRNGKey(1), 8, 9, 9, stones=4
    )
    boards = np.asarray(boards)
    assert boards.shape == (8, 9, 9)
    assert ((boards != 0).sum((1, 2)) == 4).all()
