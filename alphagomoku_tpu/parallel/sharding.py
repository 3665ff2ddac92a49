"""Device-mesh sharding for the learner and the self-play actors.

The reference is single-node multi-threaded (SURVEY.md section 2.12): its
"device farm" (one generator thread per GPU) and in-process sample queue
become, TPU-natively:

- actor sharding: the lockstep env/search batch laid out over a `dp` mesh
  axis — every chip runs the same jitted selfplay step on its shard,
- learner DP: gradients all-reduced over `dp` by XLA (GSPMD inserts the
  psum from the sharding annotations),
- optional `tp`: conv/dense output channels sharded over a second axis for
  large models (collectives ride ICI).

There is no NCCL/MPI analogue to port — `jax.distributed` + GSPMD over a
`Mesh` replaces the whole reference transport layer (reference:
utils/networking.hpp is dead code).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int = 1) -> Mesh:
    """Mesh over the first `n_devices` devices with a data-parallel axis and
    an optional tensor-parallel axis."""
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devs)
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    dp = n // tp
    return Mesh(np.asarray(devs).reshape(dp, tp), ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for env/sample batches."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params: Any, tensor_parallel: bool) -> Any:
    """NamedSharding tree for a params pytree: replicated, or tp-sharded
    kernels when tensor_parallel (GSPMD propagates the rest and inserts the
    needed collectives).  Output channels of conv/dense kernels go over
    `tp`; head kernels whose width does not divide stay replicated."""
    tp_size = mesh.shape["tp"]

    def spec(leaf) -> NamedSharding:
        if (
            tensor_parallel
            and leaf.ndim >= 2
            and leaf.shape[-1] % tp_size == 0
        ):
            return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + ["tp"])))
        return replicated(mesh)

    return jax.tree_util.tree_map(spec, params)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Put a host batch onto the mesh, sharded over dp on the leading axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
