"""Multi-host bring-up, host-sharded data ingest and the DP learner step.

The reference has no distributed backend at all (single node, threads +
shared memory; its socket code is dead — SURVEY.md §2.12); multi-host
scale-out is a new requirement of this framework.  The design follows the
standard JAX recipe:

- `initialize()` wraps `jax.distributed.initialize` (coordinator address +
  process count + process id, or automatic detection on TPU pods).
- selfplay is embarrassingly parallel: each host plays its own batch on its
  local chips with a host-folded RNG stream (`host_fold`) — the multi-host
  analogue of the reference's one-GeneratorThread-per-GPU device farm
  (GeneratorManager.cpp), with zero cross-host traffic.
- each host ingests only the games it generated into its local
  `ReplayBuffer` (host-sharded replay — no sample ever crosses hosts).
- the learner is data-parallel over ONE global mesh: every host samples a
  local sub-batch, `global_batch_from_local` assembles the global array
  (each host holding its addressable shards), and `make_dp_train_step`
  jits the train step with the batch sharded over `dp` — GSPMD inserts the
  gradient all-reduce over ICI/DCN.  Replicated train state stays bitwise
  identical on every host, which replaces the reference's
  NetworkLoader checkpoint-file polling for parameter distribution.
- checkpoint/metadata files are written by the coordinator only
  (`is_coordinator`), with `barrier()` ordering writers before readers.

`run_rl_round`/`make_rl_round` package the fully-fused alternative (one jit
= selfplay -> targets -> train over the global mesh); it is exercised by
__graft_entry__.dryrun_multichip on a virtual device mesh and by the
2-process CPU test (tests/test_multiprocess.py)."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

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


def is_coordinator() -> bool:
    """True on the process that owns file writes (checkpoints, metadata)."""
    return jax.process_index() == 0


def host_fold(key: jax.Array) -> jax.Array:
    """Per-host RNG stream: fold the process index into a shared base key.
    Use for host-local randomness (selfplay game seeds, buffer sampling);
    never for a key that is passed replicated into a global-mesh jit."""
    return jax.random.fold_in(key, jax.process_index())


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point (orders coordinator
    file writes before other hosts read them).  No-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def global_batch_from_local(mesh, local_batch: Any) -> Any:
    """Assemble a dp-sharded global batch from each host's local sub-batch.

    Every process passes its own `local_batch` pytree (leading axis =
    per-host batch); the returned global arrays have leading axis
    per-host * process_count, with each host holding only its addressable
    shards.  Single-process this is a plain device_put with dp sharding."""
    sh = batch_sharding(mesh)

    def one(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree_util.tree_map(one, local_batch)


def make_dp_train_step(train_step: Callable, mesh) -> Callable:
    """Jit a train step for the global mesh: replicated state + key,
    dp-sharded batch; GSPMD inserts the gradient all-reduce."""
    rep = replicated(mesh)
    bs = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, bs, rep),
        out_shardings=(rep, rep),
    )


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
    -> (train_state, loss_parts); inputs must be identical (replicated) on
    every process, the selfplay batch is split over the global dp axis by
    GSPMD, collectives ride the mesh."""
    if mesh is None:
        mesh = make_mesh(tp=tp)
    # total work scales with the number of hosts: each host contributes
    # batch_per_host boards, split over its local share of the dp axis
    global_batch = batch_per_host * jax.process_count()

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
