"""Round benchmark: batched MCTS throughput (simulations/s per chip).

Headline metric per BASELINE.md: >100K MCTS sims/s per chip at the
800-sims/move search configuration, with the flagship network
(ConvNextPVQMraw 6x64, bf16) evaluated inside the search loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from alphagomoku_tpu.game.types import GameRules, CROSS, CIRCLE
    from alphagomoku_tpu.game import vectorized as V
    from alphagomoku_tpu.models import create_network
    from alphagomoku_tpu.search import mcts

    BATCH = 1280
    H = W = 15
    SIMS_PER_CALL = 400  # one full search at the 800-sims/move regime
    CALLS = 2

    tables = V.device_tables(GameRules.FREESTYLE)
    net = create_network("ConvNextPVQMraw", blocks=6, filters=64)
    x = jnp.zeros((BATCH, H, W, net.cfg.input_planes), jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)

    def apply(v, planes):
        return net.apply(v, planes, train=False)

    cfg = mcts.MCTSConfig(max_nodes=SIMS_PER_CALL + 8, max_edges=32, max_depth=24)

    rng = np.random.default_rng(0)
    boards = np.zeros((BATCH, H, W), np.int8)
    # a few random opening stones so trees are not identical
    for b in range(BATCH):
        n = rng.integers(2, 8)
        cells = rng.choice(H * W, size=n, replace=False)
        signs = np.where(np.arange(n) % 2 == 0, CROSS, CIRCLE)
        boards[b].flat[cells] = signs
    boards = jnp.asarray(boards)
    stm = jnp.full((BATCH,), CROSS, jnp.int8)

    f = jax.jit(
        lambda v, b, s: mcts.run_search(
            apply, v, tables, cfg, b, s, SIMS_PER_CALL, raw_input=True
        )
    )

    # warmup / compile
    state = f(variables, boards, stm)
    jax.block_until_ready(state.tree.node_visits)

    t0 = time.perf_counter()
    for _ in range(CALLS):
        state = f(variables, boards, stm)
    jax.block_until_ready(state.tree.node_visits)
    dt = time.perf_counter() - t0

    sims_per_s = BATCH * SIMS_PER_CALL * CALLS / dt
    print(
        json.dumps(
            {
                "metric": "mcts_sims_per_s_per_chip",
                "value": round(sims_per_s, 1),
                "unit": "sims/s",
                "vs_baseline": round(sims_per_s / 100_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
