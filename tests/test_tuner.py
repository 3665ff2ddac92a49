"""Engine-parameter tuning harness tests (reference: tuning_launcher with
SPSA + GSPRT over paired matches)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.search import mcts
from alphagomoku_tpu.eval.tuner import (
    DEFAULT_PARAMS,
    EngineTuner,
    config_from_theta,
    play_param_match_full,
)


def test_config_from_theta():
    base = mcts.MCTSConfig()
    cfg = config_from_theta(base, DEFAULT_PARAMS, [0.0, 1.0, 0.5])
    assert cfg.exploration_constant == 0.25
    assert abs(cfg.fpu_reduction - 0.6) < 1e-9
    assert abs(cfg.policy_expansion_temperature - 1.25) < 1e-9


def test_param_match_and_spsa_step():
    net = create_network("FastPolicy", blocks=1, filters=8)
    x = jnp.zeros((1, 9, 9, net.cfg.input_planes), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    tables = V.device_tables(GameRules.FREESTYLE)
    apply = lambda v, p: net.apply(v, p, train=False)
    base = mcts.MCTSConfig(max_nodes=16, max_edges=8, max_depth=6)

    rng = np.random.default_rng(0)
    from alphagomoku_tpu.eval.match import random_openings

    openings = random_openings(rng, 2, 9, 9)
    res = play_param_match_full(
        apply, variables, tables,
        base._replace(exploration_constant=0.5), base, 8, openings,
    )
    assert 0.0 <= res.score_a <= 1.0
    assert res.pentanomial.sum() == 2

    tuner = EngineTuner(
        apply, variables, tables, base,
        num_simulations=8, games_per_step=4, rows=9, cols=9,
    )
    tuned = tuner.tune(steps=1)
    assert isinstance(tuned, mcts.MCTSConfig)
    assert tuner.spsa.step == 1
