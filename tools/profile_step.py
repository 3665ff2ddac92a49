"""Attribute MCTS step time to phases via make_simulate_fn(profile_cutoff),
one subprocess per phase (sequential large recompiles in one process can
fault the device — see NEXT.md perf lore).

Usage: python tools/profile_step.py [--solver vct] [--cap 256] [--blocks 6]
       [--filters 64] [--batch 1280]
Prints one JSON line per phase: select -> +evaluate -> +expand -> full.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_BODY = r"""
import json, sys, time
sys.path.insert(0, {cwd!r})
import numpy as np
import jax
import jax.numpy as jnp

from alphagomoku_tpu.game.types import GameRules, CROSS, CIRCLE
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.search import mcts

BATCH = {batch}
H = W = 15
SIMS = 400
CUTOFF = {cutoff!r}

tables = V.device_tables(GameRules.FREESTYLE)
net = create_network("ConvNextPVQMraw", blocks={blocks}, filters={filters})
x = jnp.zeros((BATCH, H, W, net.cfg.input_planes), jnp.bfloat16)
variables = net.init(jax.random.PRNGKey(0), x, train=False)

def apply(v, planes):
    return net.apply(v, planes, train=False)

cfg = mcts.MCTSConfig(max_nodes=SIMS + 8, max_edges=32, max_depth=16,
                      leaf_solver={solver!r}, leaf_solver_steps=16,
                      leaf_solver_cap={cap})

rng = np.random.default_rng(0)
boards = np.zeros((BATCH, H, W), np.int8)
for b in range(BATCH):
    n = rng.integers(2, 8)
    cells = rng.choice(H * W, size=n, replace=False)
    boards[b].flat[cells] = np.where(np.arange(n) % 2 == 0, CROSS, CIRCLE)
boards = jnp.asarray(boards)
stm = jnp.full((BATCH,), CROSS, jnp.int8)


# build a REALISTIC tree first (the cutoff variants don't grow the tree,
# so timing them from the root would measure depth-1 descents)
built = jax.jit(
    lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, SIMS,
                                    raw_input=True)
)(variables, boards, stm)
jax.block_until_ready(built.tree.node_visits)

simulate = mcts.make_simulate_fn(apply, tables, cfg, True,
                                 profile_cutoff=CUTOFF)
REPS = 40


def run_reps(v, st):
    def step(s, _):
        return simulate(v, s), None
    st, _ = jax.lax.scan(step, st, None, length=REPS)
    return st

f = jax.jit(run_reps)
state = f(variables, built)
jax.block_until_ready(state.stats.depth_sum)
t0 = time.perf_counter()
for _ in range(2):
    state = f(variables, built)
jax.block_until_ready(state.stats.depth_sum)
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({{
    "cutoff": CUTOFF, "ms_per_step": round(dt / (2 * REPS) * 1e3, 3)
}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default="none")
    ap.add_argument("--cap", type=int, default=0)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--filters", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1280)
    args = ap.parse_args()
    for cutoff in (None, "select", "evaluate", "expand"):
        code = _BODY.format(
            cwd=os.getcwd(), cutoff=cutoff, batch=args.batch,
            blocks=args.blocks, filters=args.filters,
            solver=args.solver, cap=args.cap,
        )
        env = dict(os.environ)
        env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=1500, env=env,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[7:], flush=True)
                break
        else:
            print(json.dumps({"cutoff": cutoff,
                              "error": out.stderr[-400:]}), flush=True)


if __name__ == "__main__":
    main()
