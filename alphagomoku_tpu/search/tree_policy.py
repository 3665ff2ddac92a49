"""Learnable tree policy: a small MLP over per-edge statistics used as the
root selection policy when ``MCTSConfig.policy == "learnable"``.

Counterpart of the reference's LearnablePolicySelector
(reference: src/search/monte_carlo/EdgeSelector.cpp:735-860 and
EdgeSelector.hpp:50-65): an 8-feature -> 64 -> 64 -> 1 ReLU MLP whose input
rows are [log10(parent visits), parent win rate, parent draw rate,
log10(1 + edge visits), log10(max(1e-6, prior)), edge win rate,
edge draw rate, 1.0]; its scores are sampled with a visit-scaled softmax
temperature.  The reference loads frozen weights trained offline; here the
parameters are ordinary JAX pytrees with a self-contained training step
(`make_train_step`) that distills completed searches: the MLP learns to
rank edges by their final visit share, so it can replace PUCT inside the
tree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

FEATURES = 8
HIDDEN = 64


class TreePolicyParams(NamedTuple):
    w1: jax.Array  # [8, 64]
    b1: jax.Array  # [64]
    w2: jax.Array  # [64, 64]
    b2: jax.Array  # [64]
    w3: jax.Array  # [64, 1]
    b3: jax.Array  # [1]


def init_params(key: jax.Array) -> TreePolicyParams:
    k1, k2, k3 = jax.random.split(key, 3)

    def dense(k, fan_in, fan_out):
        scale = jnp.sqrt(2.0 / fan_in)
        return jax.random.normal(k, (fan_in, fan_out)) * scale

    return TreePolicyParams(
        w1=dense(k1, FEATURES, HIDDEN),
        b1=jnp.zeros((HIDDEN,)),
        w2=dense(k2, HIDDEN, HIDDEN),
        b2=jnp.zeros((HIDDEN,)),
        w3=dense(k3, HIDDEN, 1),
        b3=jnp.zeros((1,)),
    )


def edge_features(
    parent_visits: jax.Array,  # [B]
    parent_wdl: jax.Array,  # [B, 2] (win, draw) rates
    edge_visits: jax.Array,  # [B, K] float
    prior: jax.Array,  # [B, K]
    edge_win: jax.Array,  # [B, K]
    edge_draw: jax.Array,  # [B, K]
) -> jax.Array:
    """The 8 per-edge input features [B, K, 8] (reference feature packing:
    EdgeSelector.cpp:795-810)."""
    k = edge_visits.shape[-1]
    bcast = lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], k))
    return jnp.stack(
        [
            bcast(jnp.log10(jnp.maximum(parent_visits, 1.0))),
            bcast(parent_wdl[..., 0]),
            bcast(parent_wdl[..., 1]),
            jnp.log10(1.0 + edge_visits),
            jnp.log10(jnp.maximum(prior, 1.0e-6)),
            edge_win,
            edge_draw,
            jnp.ones_like(edge_visits),
        ],
        axis=-1,
    )


def apply(params: TreePolicyParams, feats: jax.Array) -> jax.Array:
    """[..., 8] features -> [...] scores (the reference's 3-gemm forward,
    EdgeSelector.cpp:816-822)."""
    h = jax.nn.relu(feats @ params.w1 + params.b1)
    h = jax.nn.relu(h @ params.w2 + params.b2)
    return (h @ params.w3 + params.b3)[..., 0]


def make_train_step(learning_rate: float = 1e-3):
    """SGD step distilling final root visit shares: cross-entropy between
    the MLP's softmax over edges and the search's final visit distribution.
    Batch: feats [B, K, 8], target visit share [B, K], valid mask [B, K]."""

    def loss_fn(params, feats, target, valid):
        logits = jnp.where(valid, apply(params, feats), -jnp.inf)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -(jnp.where(valid, target * logp, 0.0)).sum(-1)
        return ce.mean()

    @jax.jit
    def step(params, feats, target, valid):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, target, valid)
        new = jax.tree_util.tree_map(lambda p, g: p - learning_rate * g, params, grads)
        return TreePolicyParams(*new), loss

    return step


def training_batch_from_state(state) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Extract (feats, visit-share target, valid) for the root of a finished
    search, for `make_train_step`."""
    tree = state.tree
    b = jnp.arange(tree.batch)
    root = state.root_node
    from . import mcts as _mcts

    es = _mcts.edge_stats(tree, b, root)
    visits = es.visits.astype(jnp.float32)
    actions = tree.edge_action[b, root]
    valid = actions != jnp.int16(-1)
    prior = tree.edge_prior[b, root].astype(jnp.float32)
    qw, qd = es.q_win, es.q_draw
    n_parent = tree.node_visits[b, root].astype(jnp.float32)
    parent_wdl = tree.node_value_sum[b, root] / jnp.maximum(n_parent, 1.0)[..., None]
    feats = edge_features(n_parent, parent_wdl, visits, prior, qw, qd)
    target = jnp.where(valid, visits, 0.0)
    target = target / jnp.maximum(target.sum(-1, keepdims=True), 1e-9)
    return feats, target, valid
