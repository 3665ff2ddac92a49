"""Final-move selector family over finished search roots.

Counterpart of the reference's EdgeSelector zoo
(reference: src/search/monte_carlo/EdgeSelector.cpp:680+ create registry):
the in-tree policy (PUCT + init-to + noise) lives in mcts._edge_utility;
this module provides the *final* selectors applied to the root when a move
must be produced — best (visits+value with proven-score overrides),
max_visit, min_visit, max_value, max_policy, and balanced (minimize
|expectation - 0.5|, used by opening balancing / swap2,
reference: BalancedSelector)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import mcts
from . import score as S


def _root_edges(state: mcts.SearchState):
    tree = state.tree
    rb = jnp.arange(tree.batch)
    root = state.root_node
    actions = tree.edge_action[rb, root].astype(jnp.int32)
    es = mcts.edge_stats(tree, rb, root)
    visits = es.visits.astype(jnp.float32)
    escore = es.score
    prior = tree.edge_prior[rb, root].astype(jnp.float32)
    valid = actions != mcts.NULL
    q = es.q_win + 0.5 * es.q_draw
    return actions, visits, q, escore, prior, valid


def _pick(state: mcts.SearchState, util: jax.Array, valid: jax.Array) -> jax.Array:
    h, w = state.root_board.shape[1], state.root_board.shape[2]
    slot = jnp.argmax(jnp.where(valid, util, -jnp.inf), -1)
    b = jnp.arange(state.tree.batch)
    actions = state.tree.edge_action[b, state.root_node].astype(jnp.int32)
    return jnp.clip(actions[b, slot], 0, h * w - 1)


def select(state: mcts.SearchState, policy: str = "best", key=None, temperature=0.0):
    """Pick a root move [B] with the named selector
    (reference: EdgeSelectorConfig policy strings, utils/configs.hpp:67-87)."""
    actions, visits, q, escore, prior, valid = _root_edges(state)
    if policy in ("best", "max_balance"):  # default play selector
        return mcts.select_move(state, key, temperature)
    if policy == "max_visit":
        return _pick(state, visits, valid)
    if policy == "min_visit":
        return _pick(state, -visits, valid & (visits > 0))
    if policy == "max_value":
        util = q
        dist = S.get_distance(escore).astype(jnp.float32)
        util = jnp.where(S.is_win(escore), 1000.0 - dist, util)
        util = jnp.where(S.is_loss(escore), -1000.0 + dist, util)
        return _pick(state, util, valid & (visits > 0))
    if policy == "max_policy":
        return _pick(state, prior, valid)
    if policy == "lcb":
        # lower confidence bound: conservative final pick (reference:
        # LCBSelector + LCB op, EdgeSelector.cpp:446-470,1340-1346)
        tree = state.tree
        rb = jnp.arange(tree.batch)
        n_parent = tree.node_visits[rb, state.root_node].astype(jnp.float32)
        u = 1.25 * jnp.sqrt(
            jnp.log(jnp.maximum(n_parent, 1.0))[:, None] / (1.0 + visits)
        )
        util = q - u
        dist = S.get_distance(escore).astype(jnp.float32)
        util = jnp.where(S.is_loss(escore), -1.0e6 + dist + prior, util)
        return _pick(state, util, valid & (visits > 0))
    if policy == "balanced":
        # closest-to-draw evaluation among visited moves, never a proven
        # win/loss (reference: BalancedSelector for swap2/opening balance)
        util = -jnp.abs(q - 0.5)
        util = jnp.where(S.is_proven(escore), -1000.0, util)
        return _pick(state, util, valid & (visits > 0))
    raise ValueError(f"unknown selector policy {policy!r}")
