"""Throughput matrix across rule variants and board sizes.

Secondary benchmark tooling (the driver's headline number comes from
bench.py); prints one JSON line per configuration."""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from alphagomoku_tpu.game.types import GameRules, CROSS, CIRCLE
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.search import mcts


def bench_config(rules: GameRules, size: int, batch: int = 1024, sims: int = 200):
    tables = V.device_tables(rules)
    net = create_network("ConvNextPVQMraw", blocks=6, filters=64)
    x = jnp.zeros((batch, size, size, net.cfg.input_planes), jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    apply = lambda v, p: net.apply(v, p, train=False)
    def mkboards(seed):
        # DISTINCT inputs per timed call: the remote device client can
        # return stale results for identical repeated executions, which
        # reads as absurd throughput (the quick_time.py discipline)
        r = np.random.default_rng(seed)
        boards = np.zeros((batch, size, size), np.int8)
        for b in range(batch):
            n = r.integers(2, 8)
            cells = r.choice(size * size, size=n, replace=False)
            boards[b].flat[cells] = np.where(np.arange(n) % 2 == 0, CROSS, CIRCLE)
        return jnp.asarray(boards)

    stm = jnp.full((batch,), CROSS, jnp.int8)
    cfg = mcts.MCTSConfig(max_nodes=sims + 8, max_edges=32, max_depth=24)
    f = jax.jit(
        lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, sims)
    )
    st = f(variables, mkboards(0), stm)
    jax.block_until_ready(st.tree.node_visits)
    t0 = time.perf_counter()
    for i in (1, 2):
        st = f(variables, mkboards(i), stm)
        jax.block_until_ready(st.tree.node_visits)
    dt = (time.perf_counter() - t0) / 2
    print(
        json.dumps(
            {
                "rules": rules.name,
                "board": f"{size}x{size}",
                "batch": batch,
                "sims_per_s": round(batch * sims / dt, 1),
            }
        ),
        flush=True,
    )


def _main():
    import os
    import subprocess

    # one subprocess per configuration: sequential big recompiles against
    # the remote-compile service in one process can fault the device
    for rules, size in [
        ("FREESTYLE", 15),
        ("STANDARD", 15),
        ("RENJU", 15),
        ("CARO5", 15),
        ("FREESTYLE", 20),
    ]:
        code = (
            "from tools.bench_matrix import bench_config\n"
            "from alphagomoku_tpu.game.types import GameRules\n"
            f"bench_config(GameRules.{rules}, {size})\n"
        )
        env = dict(os.environ)
        env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
        subprocess.run(["python", "-c", code], env=env, timeout=1500)


if __name__ == "__main__":
    _main()
