"""Worker for the 2-process multi-host CPU test (tests/test_multiprocess.py).

Each process gets 4 virtual CPU devices; `jax.distributed.initialize` joins
them into one 8-device cluster (Gloo collectives).  The worker then

1. runs one fused actor->learner round over the GLOBAL mesh
   (parallel.distributed.make_rl_round, replicated inputs, batch split over
   all 8 devices by GSPMD), and
2. runs one full TrainingManager iteration in distributed mode: per-host
   selfplay with host-folded RNG -> host-sharded replay -> DP train steps
   over the global mesh -> coordinator-only checkpoint IO,

and writes a result JSON (losses + a param digest) for the parent test to
compare across processes: the replicated train state must come out bitwise
identical on both hosts.

Usage: python mp_worker.py <process_id> <num_processes> <port> <workdir>
"""

import hashlib
import json
import os
import sys

pid, nproc, port, workdir = (
    int(sys.argv[1]),
    int(sys.argv[2]),
    sys.argv[3],
    sys.argv[4],
)

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# must run before ANY jax call that initialises the backend (importing the
# package builds device tables) — this is what parallel.distributed.initialize
# wraps; real launchers call it first thing
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

from alphagomoku_tpu.parallel import distributed as D

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 4 * nproc

import jax.numpy as jnp
import numpy as np

from alphagomoku_tpu.game.types import GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.parallel import make_mesh
from alphagomoku_tpu.search import mcts
from alphagomoku_tpu.selfplay import SelfplayConfig
from alphagomoku_tpu.training import TrainConfig, create_train_state, make_train_step
from alphagomoku_tpu.training.manager import ManagerConfig, TrainingManager

result = {"process": pid}

# -- part 1: fused RL round over the global mesh -----------------------------
h = w = 9
net = create_network("FastPolicy", blocks=1, filters=8)
tables = V.device_tables(GameRules.FREESTYLE)
x = jnp.zeros((1, h, w, net.cfg.input_planes), jnp.float32)
variables = net.init(jax.random.PRNGKey(0), x, train=False)

tcfg = TrainConfig()
state, tx = create_train_state(net, variables, tcfg)
train_step = make_train_step(net, tx, tables, tcfg)


def apply(v, p):
    return net.apply(v, p, train=False)


mesh = make_mesh(tp=1)  # all 8 global devices
fn, mesh = D.make_rl_round(
    apply,
    train_step,
    tables,
    mcts.MCTSConfig(max_nodes=10, max_edges=8, max_depth=6),
    SelfplayConfig(num_simulations=6, max_moves=8, temperature_moves=4),
    batch_per_host=8,
    rows=h,
    cols=w,
    mesh=mesh,
)
with mesh:
    from alphagomoku_tpu.parallel import replicated

    rep = replicated(mesh)
    infer = jax.device_put(
        {"params": state.params, "batch_stats": state.batch_stats}, rep
    )
    state_g = jax.device_put(state, rep)
    key = jax.device_put(jax.random.PRNGKey(1), rep)
    new_state, parts = fn(infer, state_g, key)
    jax.block_until_ready(new_state.params)
result["rl_round_loss"] = float(parts["total"])
assert np.isfinite(result["rl_round_loss"])
D.barrier("rl_round_done")

# -- part 2: TrainingManager in distributed mode ------------------------------
cfg = ManagerConfig(
    working_dir=workdir,
    rows=9,
    cols=9,
    architecture="FastPolicy",
    blocks=1,
    filters=8,
    games_per_iteration=8,
    selfplay_batch=8,
    num_simulations=8,
    train_steps_per_iteration=2,
    train_batch_size=16,
    balanced_openings=False,
    use_gating=True,
    gating_games=4,
    # multi-opponent rating enabled (VERDICT r4 task 9: the old worker ran
    # with evaluation off) — iteration 1 rates vs checkpoint 0 per host
    use_evaluation=True,
    eval_opponents=(-1,),
    eval_games=4,
    eval_in_parallel=False,
    leaf_solver="none",
    tree_reuse=False,
    distributed=True,
    seed=3,
)
mgr = TrainingManager(cfg)
metrics = mgr.run_iteration_rl(0)
result["train_total"] = metrics.get("total")
result["samples"] = metrics.get("samples")
metrics1 = mgr.run_iteration_rl(1)
result["train_total_1"] = metrics1.get("total")
D.barrier("two_iterations_done")
# evaluation runs on the coordinator only (the reference's single
# EvaluationManager); after the barrier its rating.txt must be visible
result["rated"] = os.path.exists(os.path.join(workdir, "rating.txt"))

# -- part 3: teacher -> student distillation over the global mesh -------------
# (closed in r5: the r4 guard hard-failed `distillation in multi-host mode`)
import dataclasses

cfg_d = dataclasses.replace(
    cfg,
    distill_from=mgr.checkpoint_path(mgr.metadata["last_checkpoint"]),
    use_gating=False,
    use_evaluation=False,
)
mgr2 = TrainingManager(cfg_d)
mgr2.generate_games(0)  # loads the existing host-sharded buffer from disk
dmetrics = mgr2.train_iteration(2)
result["distill_total"] = dmetrics.get("total")
assert np.isfinite(result["distill_total"]), dmetrics
D.barrier("distill_done")

params_np = jax.device_get(mgr2.state.params)
digest = hashlib.sha256()
for leaf in jax.tree_util.tree_leaves(params_np):
    digest.update(np.ascontiguousarray(leaf).tobytes())
result["param_digest"] = digest.hexdigest()
result["last_checkpoint"] = mgr2.metadata["last_checkpoint"]
result["best_checkpoint"] = mgr2.metadata["best_checkpoint"]

with open(os.path.join(workdir, f"result_{pid}.json"), "w") as fh:
    json.dump(result, fh)
print(f"[worker {pid}] ok: {result}", flush=True)
