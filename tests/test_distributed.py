"""Actor->learner round over the virtual device mesh
(parallel.distributed.make_rl_round)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.parallel import make_mesh
from alphagomoku_tpu.parallel.distributed import make_rl_round
from alphagomoku_tpu.search import mcts
from alphagomoku_tpu.selfplay import SelfplayConfig
from alphagomoku_tpu.training import TrainConfig, create_train_state, make_train_step


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_rl_round_on_mesh():
    h = w = 9
    net = create_network("FastPolicy", blocks=1, filters=8)
    tables = V.device_tables(GameRules.FREESTYLE)
    x = jnp.zeros((1, h, w, net.cfg.input_planes), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)

    cfg = TrainConfig()
    state, tx = create_train_state(net, variables, cfg)
    train_step = make_train_step(net, tx, tables, cfg)

    def apply(v, p):
        return net.apply(v, p, train=False)

    mesh = make_mesh(8, tp=1)
    fn, mesh = make_rl_round(
        apply,
        train_step,
        tables,
        mcts.MCTSConfig(max_nodes=10, max_edges=8, max_depth=6),
        SelfplayConfig(num_simulations=6, max_moves=8, temperature_moves=4),
        batch_per_host=16,
        rows=h,
        cols=w,
        mesh=mesh,
    )
    with mesh:
        infer = {"params": state.params, "batch_stats": state.batch_stats}
        new_state, parts = fn(infer, state, jax.random.PRNGKey(1))
        jax.block_until_ready(new_state.params)
    assert np.isfinite(float(parts["total"]))
    assert int(new_state.step) == 1
