"""Multi-host bring-up and actor->learner transport.

The reference has no distributed backend at all (single node, threads +
shared memory; its socket code is dead — SURVEY.md §2.12); multi-host
scale-out is a new requirement of this framework.  The design follows the
standard JAX recipe:

- `initialize()` wraps `jax.distributed.initialize` (coordinator address +
  process count + process id, or automatic detection on TPU pods).
- one global `Mesh` spans all hosts; the `dp` axis covers every chip.
- the jitted selfplay step runs SPMD: each host computes its batch shard,
  zero collectives (play is embarrassingly parallel).
- sample transport actors->learner IS the sharding: `make_targets` output
  stays dp-sharded, and the jitted train step consumes it shard-wise with
  GSPMD inserting the gradient all-reduce over ICI/DCN — replacing the
  reference's in-process mutex queue (GeneratorManager::addToBuffer).
- parameter broadcast learner->actors is implicit: replicated params are
  updated collectively by the train step on every host (replacing the
  reference's NetworkLoader checkpoint-file polling).

`run_rl_round` packages one full actor->learner round; on a single host it
degrades to plain data parallelism (and is exercised by
__graft_entry__.dryrun_multichip on a virtual device mesh)."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..game import vectorized as V
from ..search import mcts
from ..selfplay import SelfplayConfig, make_targets, play_games
from .sharding import batch_sharding, make_mesh, replicated


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the multi-host runtime.  On TPU pods all arguments are
    auto-detected; on CPU/GPU clusters pass them explicitly."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_rl_round(
    net_apply: Callable,
    train_step: Callable,
    tables: V.RuleTables,
    mcfg: mcts.MCTSConfig,
    scfg: SelfplayConfig,
    batch_per_host: int,
    rows: int,
    cols: int,
    mesh=None,
    tp: int = 1,
):
    """Jitted full actor->learner round over the (global) mesh:
    sharded selfplay -> targets -> one DP train step.

    Returns (round_fn, mesh).  round_fn(variables_infer, train_state, key)
    -> (train_state, loss_parts); inputs/outputs are sharded as annotated,
    collectives ride the mesh."""
    if mesh is None:
        mesh = make_mesh(tp=tp)
    n_dp = mesh.shape["dp"]
    global_batch = batch_per_host * n_dp if jax.process_count() > 1 else batch_per_host

    def rl_round(variables_infer: Any, train_state: Any, key: jax.Array):
        kp, kt = jax.random.split(key)
        result = play_games(
            net_apply, variables_infer, tables, mcfg, scfg, kp,
            global_batch, rows, cols,
        )
        targets = make_targets(result, rows * cols)
        return train_step(train_state, targets, kt)

    rep = replicated(mesh)
    fn = jax.jit(
        rl_round,
        in_shardings=(rep, None, rep),
        out_shardings=(None, None),
    )
    return fn, mesh
