"""Round benchmark: batched MCTS throughput (simulations/s per chip).

Headline metric per BASELINE.md: >100K MCTS sims/s per chip at a TRUE
800-sims/move search (one full 800-simulation search per move, tree capacity
sized to hold it), with the flagship network evaluated inside the search
loop.  Two configurations are published:

- headline: the solver-less search (pure MCTS+NN), and
- strength: the engine-default configuration — the budgeted VCT proof
  search fused into every leaf batch (leaf_solver="vct", the setting that
  earned +172 Elo at equal sims in the paired solver gate), with the solve
  compacted to the threat-bearing leaves (leaf_solver_cap).

Reports achieved TFLOP/s and MFU next to sims/s for both the 6x64 flagship
and the 8x128 SURVEY build-plan network.

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", "tflops", "mfu", "config",
   "strength": {...}, "net_8x128": {...}}

Each configuration runs in its own subprocess (sequential large recompiles
in one process can fault the device — see NEXT.md perf lore).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_BODY = r"""
import json, sys, time
sys.path.insert(0, {cwd!r})
import numpy as np
from alphagomoku_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp

from alphagomoku_tpu.game.types import GameRules, CROSS, CIRCLE
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.search import mcts

BATCH = {batch}
H = W = 15
SIMS = 800  # one full search at 800 sims/move (BASELINE config)
CALLS = 2

tables = V.device_tables(GameRules.FREESTYLE)
net = create_network("ConvNextPVQMraw", blocks={blocks}, filters={filters})
x = jnp.zeros((BATCH, H, W, net.cfg.input_planes), jnp.bfloat16)
variables = net.init(jax.random.PRNGKey(0), x, train=False)

def apply(v, planes):
    return net.apply(v, planes, train=False)

# max_depth=16: the per-simulation descent cap.  At 800 sims no descent
# exceeds it -- the whole search was verified BIT-IDENTICAL (node_visits
# array equality) against max_depth=32 on this config; the smaller cap
# shrinks the backup path machinery (P = leaf_batch * max_depth).
cfg = mcts.MCTSConfig(max_nodes=SIMS + 8, max_edges=32, max_depth=16,
                      leaf_solver={solver!r}, leaf_solver_steps=16,
                      leaf_solver_cap={cap}, loss_prover={loss_prover},
                      loss_cap=32)

rng = np.random.default_rng(0)
boards = np.zeros((BATCH, H, W), np.int8)
for b in range(BATCH):
    n = rng.integers(2, 8)
    cells = rng.choice(H * W, size=n, replace=False)
    boards[b].flat[cells] = np.where(np.arange(n) % 2 == 0, CROSS, CIRCLE)
boards = jnp.asarray(boards)
stm = jnp.full((BATCH,), CROSS, jnp.int8)

f = jax.jit(
    lambda v, b, s: mcts.run_search(apply, v, tables, cfg, b, s, SIMS, raw_input=True)
)

# analytic model FLOPs (XLA cost_analysis is unreliable over the tunnel):
# conv kernel (kh,kw,cin,cout) -> 2*H*W*kh*kw*cin*cout per sample, dense
# (i,o) -> 2*i*o; the tree math adds negligible FLOPs, so this reports the
# MXU-relevant model compute
from jax.tree_util import tree_flatten_with_path

leaves, _ = tree_flatten_with_path(variables["params"])
per_sample = 0.0
for path, leaf in leaves:
    name = str(path)
    if "kernel" in name and getattr(leaf, "ndim", 0) == 4:
        kh, kw, cin, cout = leaf.shape
        per_sample += 2.0 * H * W * kh * kw * cin * cout
    elif "kernel" in name and getattr(leaf, "ndim", 0) == 2:
        per_sample += 2.0 * leaf.shape[0] * leaf.shape[1]
# one evaluation per simulation plus the root evaluation
flops_per_call = per_sample * BATCH * (SIMS + 1)

state = f(variables, boards, stm)
jax.block_until_ready(state.tree.node_visits)

t0 = time.perf_counter()
for _ in range(CALLS):
    state = f(variables, boards, stm)
jax.block_until_ready(state.tree.node_visits)
dt = time.perf_counter() - t0

sims_per_s = BATCH * SIMS * CALLS / dt
tflops = flops_per_call * CALLS / dt / 1e12

# bf16 peak of one TPU v5e (v5 lite) chip; other chips print kind for audit
kind = jax.devices()[0].device_kind
peak = 197.0 if ("v5" in kind.lower() or "lite" in kind.lower()) else 197.0
print("RESULT " + json.dumps({{
    "sims_per_s": round(sims_per_s, 1),
    "tflops": round(tflops, 2),
    "mfu": round(tflops / peak, 4),
    "device": kind,
}}), flush=True)
"""


def run_config(
    blocks: int, filters: int, batch: int,
    solver: str = "none", cap: int = 0, loss_prover: bool = False,
    _retry: bool = True,
) -> dict:
    """One config in a fresh subprocess.  A result outside the sane band is
    re-run once: the remote device can FAULT after big sequential compiles
    (observed: a 105K config reporting 8.4K right after three cold
    compiles) or return stale results for repeated identical executions
    (absurdly high).  One fresh-process retry reads the warm compile cache
    and reliably reports the true number."""
    code = _BODY.format(
        cwd=os.getcwd(), blocks=blocks, filters=filters, batch=batch,
        solver=solver, cap=cap, loss_prover=loss_prover,
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(os.getcwd(), ".jax_cache")
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, timeout=2400,
        capture_output=True, text=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
            sane = 20_000.0 <= result.get("sims_per_s", 0.0) <= 1_000_000.0
            if not sane and _retry:
                return run_config(
                    blocks, filters, batch, solver, cap, loss_prover,
                    _retry=False,
                )
            return result
    raise RuntimeError(
        f"bench subprocess produced no result:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def _progress(name: str, result: dict) -> None:
    """Emit each config's result AS IT COMPLETES (stdout, flushed) so a
    driver timeout mid-run still leaves parseable evidence in the captured
    tail.  The final combined JSON line is always printed last."""
    print(f"CONFIG {name}: {json.dumps(result)}", flush=True)


def main() -> None:
    flagship = run_config(blocks=6, filters=64, batch=1280)
    _progress("flagship_6x64", flagship)
    extras: dict = {}
    # the strength configuration: the engine-default vct leaf solver on
    # every simulation batch, compacted to the threat-bearing leaves
    try:
        extras["strength"] = run_config(
            blocks=6, filters=64, batch=1280, solver="vct", cap=256
        )
        extras["strength"]["config"] = "leaf_solver=vct steps=16 cap=256"
    except Exception as exc:  # the headline must survive a secondary failure
        extras["strength"] = {"error": str(exc)[:200]}
    _progress("strength", extras["strength"])
    # strength + the LOSS prover (complete-defense refutation on top of the
    # win solver -- the full engine configuration)
    try:
        extras["strength_loss_prover"] = run_config(
            blocks=6, filters=64, batch=1280, solver="vct", cap=256,
            loss_prover=True,
        )
        extras["strength_loss_prover"]["config"] = (
            "leaf_solver=vct steps=16 cap=256 loss_prover cap=32"
        )
    except Exception as exc:
        extras["strength_loss_prover"] = {"error": str(exc)[:200]}
    _progress("strength_loss_prover", extras["strength_loss_prover"])
    try:
        extras["net_8x128"] = run_config(blocks=8, filters=128, batch=1280)
    except Exception as exc:
        extras["net_8x128"] = {"error": str(exc)[:200]}
    _progress("net_8x128", extras["net_8x128"])
    print(
        json.dumps(
            {
                "metric": "mcts_sims_per_s_per_chip",
                "value": flagship["sims_per_s"],
                "unit": "sims/s",
                "vs_baseline": round(flagship["sims_per_s"] / 100_000.0, 3),
                "tflops": flagship.get("tflops"),
                "mfu": flagship.get("mfu"),
                "config": "ConvNextPVQMraw 6x64, batch 1280, true 800 sims/move",
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
