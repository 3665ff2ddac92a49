"""One-subprocess timing of the bench step (fresh process per run — the
remote device client can return stale results for identical repeated calls
after faults; bench.py runs configs in subprocesses for the same reason).

Usage: python tools/quick_time.py [--solver vct] [--cap 256] [--sims 100]
"""

import argparse
import json
import os
import subprocess
import sys

_BODY = r"""
import json, time, sys
sys.path.insert(0, {cwd!r})
from alphagomoku_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import numpy as np, jax, jax.numpy as jnp
from alphagomoku_tpu.game.types import GameRules, CROSS, CIRCLE
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.search import mcts

BATCH, H, W, SIMS = {batch}, 15, 15, {sims}
tables = V.device_tables(GameRules.FREESTYLE)
net = create_network({arch!r}, blocks={blocks}, filters={filters})
x = jnp.zeros((BATCH, H, W, net.cfg.input_planes), jnp.bfloat16)
variables = net.init(jax.random.PRNGKey(0), x, train=False)
if {fused}:
    from alphagomoku_tpu.ops.convnext_fused import make_fused_apply
    apply = make_fused_apply(net, variables, block_batch={fused_bb})
else:
    def apply(v, planes): return net.apply(v, planes, train=False)
cfg = mcts.MCTSConfig(max_nodes=SIMS + 8, max_edges=32, max_depth={max_depth},
                      leaf_batch={leaf_batch},
                      leaf_solver={solver!r}, leaf_solver_steps=16,
                      leaf_solver_cap={cap}, loss_prover={loss_prover},
                      loss_cap={loss_cap})
rng = np.random.default_rng(0)
def mkboards(seed):
    r = np.random.default_rng(seed)
    boards = np.zeros((BATCH, H, W), np.int8)
    for b in range(BATCH):
        n = r.integers(2, 8)
        cells = r.choice(H * W, size=n, replace=False)
        boards[b].flat[cells] = np.where(np.arange(n) % 2 == 0, CROSS, CIRCLE)
    return jnp.asarray(boards)
stm = jnp.full((BATCH,), CROSS, jnp.int8)
f = jax.jit(lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, SIMS, raw_input=True))
st = f(variables, mkboards(0), stm); jax.block_until_ready(st.tree.node_visits)
# distinct inputs per call: defeats any stale-result caching
t0 = time.perf_counter()
for i in (1, 2, 3):
    st = f(variables, mkboards(i), stm)
    jax.block_until_ready(st.tree.node_visits)
dt = (time.perf_counter() - t0) / 3
print("RESULT " + json.dumps({{
    "ms_per_step": round(dt / SIMS * 1e3, 3),
    "sims_per_s": round(BATCH * SIMS / dt, 1),
}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default="none")
    ap.add_argument("--cap", type=int, default=0)
    ap.add_argument("--arch", default="ConvNextPVQMraw")
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--filters", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1280)
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--leaf-batch", type=int, default=1)
    ap.add_argument("--max-depth", type=int, default=16)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--fused-bb", type=int, default=32)
    ap.add_argument("--loss-prover", action="store_true")
    ap.add_argument("--loss-cap", type=int, default=64)
    args = ap.parse_args()
    code = _BODY.format(
        cwd=os.getcwd(), batch=args.batch, sims=args.sims, arch=args.arch,
        blocks=args.blocks, filters=args.filters, solver=args.solver,
        cap=args.cap, leaf_batch=args.leaf_batch, loss_prover=args.loss_prover, loss_cap=args.loss_cap,
        max_depth=args.max_depth, fused=args.fused, fused_bb=args.fused_bb,
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1500, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line[7:])
            return
    print(json.dumps({"error": out.stderr[-500:]}))


if __name__ == "__main__":
    main()
