"""Batched on-device MCTS: fixed-capacity array trees, one tree per board,
everything (select / evaluate / expand / backup) inside one jitted scan.

This is the TPU-native re-design of the reference's thread-parallel MCTS
(reference: src/search/monte_carlo/{Tree,Search,Node,Edge,EdgeSelector,
EdgeGenerator}.cpp).  Mapping:

- `Node`/`Edge` heap objects -> struct-of-arrays `Tree` with leading dims
  `[B, N]` (nodes) and `[B, N, K]` (edges).  K = max_edges mirrors the
  reference's max_children pruning (reference: EdgeGenerator.cpp:269-303);
  a per-node `complete` flag records whether pruning dropped legal moves,
  which gates LOSS/DRAW proof propagation exactly where the reference relies
  on full expansion.
- PUCT edge selection is a masked argmax over the K edge slots
  (reference math: EdgeSelector.cpp:389-424: proven WIN/LOSS pinned to
  +/-1000 -/+ distance, DRAW to 0.5, c_puct = c + scaling*log(N),
  U = prior * c * sqrt(N_parent) / (1 + n_edge)).
- Thread coordination (virtual loss, `is_being_expanded`, information-leak
  repair, PriorityMutex; reference: Tree.cpp:226-384) disappears: lockstep
  batching issues exactly one simulation per tree per step, so there is
  nothing to race against.  The NN batch is the board batch.
- Proven-score minimax backup keeps the reference semantics
  (reference: Node.hpp:283-286 updateScore = max, Tree.cpp:299-351):
  edge score = invert_up(child score); a node is WIN if any edge is WIN,
  LOSS/DRAW only when every edge of a complete node is proven.

The transposition-table tree (NodeCache) is deliberately NOT replicated:
each move gets a fresh tree (subtree value reuse happens through the replay
of root statistics).  See SURVEY.md section 2.3 TPU mapping for the
strength-parity caveat and the planned hash-probe variant.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..game.types import CROSS, CIRCLE, GameOutcome
from ..game import vectorized as V
from ..patterns import features as F
from . import score as S
from . import static_solver

NULL = jnp.int32(-1)


class MCTSConfig(NamedTuple):
    """Search configuration (reference: utils/configs.hpp MCTSConfig +
    EdgeSelectorConfig + TreeConfig)."""

    max_nodes: int = 1024
    max_edges: int = 32  # max_children (reference default from auto-config)
    max_depth: int = 48
    exploration_constant: float = 1.25  # c_puct
    exploration_scaling: float = 0.0  # * log(parent visits)
    init_to: str = "parent"  # loss | draw | parent | q_head
    policy_expansion_temperature: float = 1.0
    noise_weight: float = 0.0  # dirichlet noise at root (selfplay)
    noise_alpha: float = 0.1


class Tree(NamedTuple):
    """Struct-of-arrays search forest: B independent trees.

    Values are (win, draw) pairs; edge stats are from the PARENT's
    side-to-move perspective, node stats from the node's own perspective
    (same convention as the reference Edge/Node)."""

    node_visits: jax.Array  # [B, N] int32
    node_value_sum: jax.Array  # [B, N, 2] f32
    node_score: jax.Array  # [B, N] uint16 packed Score
    node_moves_left_sum: jax.Array  # [B, N] f32
    node_complete: jax.Array  # [B, N] bool: edges cover ALL legal moves
    edge_action: jax.Array  # [B, N, K] int32 (r*W + c; -1 empty slot)
    edge_child: jax.Array  # [B, N, K] int32 (-1 unexpanded)
    edge_prior: jax.Array  # [B, N, K] f32
    edge_visits: jax.Array  # [B, N, K] int32
    edge_value_sum: jax.Array  # [B, N, K, 2] f32
    edge_score: jax.Array  # [B, N, K] uint16
    edge_q_init: jax.Array  # [B, N, K] f32 (q-head prior expectation)
    node_count: jax.Array  # [B] int32

    @property
    def batch(self) -> int:
        return self.node_visits.shape[0]

    @property
    def capacity(self) -> int:
        return self.node_visits.shape[1]


def init_tree(batch: int, cfg: MCTSConfig) -> Tree:
    n, k = cfg.max_nodes, cfg.max_edges
    return Tree(
        node_visits=jnp.zeros((batch, n), jnp.int32),
        node_value_sum=jnp.zeros((batch, n, 2), jnp.float32),
        node_score=jnp.full((batch, n), S.zero()),
        node_moves_left_sum=jnp.zeros((batch, n), jnp.float32),
        node_complete=jnp.zeros((batch, n), bool),
        edge_action=jnp.full((batch, n, k), NULL),
        edge_child=jnp.full((batch, n, k), NULL),
        edge_prior=jnp.zeros((batch, n, k), jnp.float32),
        edge_visits=jnp.zeros((batch, n, k), jnp.int32),
        edge_value_sum=jnp.zeros((batch, n, k, 2), jnp.float32),
        edge_score=jnp.full((batch, n, k), S.zero()),
        edge_q_init=jnp.zeros((batch, n, k), jnp.float32),
        node_count=jnp.zeros(batch, jnp.int32),
    )


# ---------------------------------------------------------------------------
# PUCT selection over the K edge slots of one node per tree
# ---------------------------------------------------------------------------


def _edge_utility(
    tree: Tree, cfg: MCTSConfig, node: jax.Array, prior: jax.Array
) -> jax.Array:
    """PUCT utility [B, K] for the edges of `node` [B]
    (reference: EdgeSelector.cpp:389-424)."""
    b = jnp.arange(tree.batch)
    visits = tree.edge_visits[b, node]
    vsum = tree.edge_value_sum[b, node]
    escore = tree.edge_score[b, node]
    valid = tree.edge_action[b, node] != NULL

    n_parent = tree.node_visits[b, node].astype(jnp.float32)
    c_puct = cfg.exploration_constant + cfg.exploration_scaling * jnp.log(
        jnp.maximum(n_parent, 1.0)
    )

    nf = visits.astype(jnp.float32)
    expectation = (vsum[..., 0] + 0.5 * vsum[..., 1]) / jnp.maximum(nf, 1.0)
    if cfg.init_to == "parent":
        pv_sum = tree.node_value_sum[b, node]
        pn = jnp.maximum(n_parent, 1.0)
        q_init = ((pv_sum[..., 0] + 0.5 * pv_sum[..., 1]) / pn)[:, None]
        q_init = jnp.broadcast_to(q_init, expectation.shape)
    elif cfg.init_to == "draw":
        q_init = jnp.full_like(expectation, 0.5)
    elif cfg.init_to == "q_head":
        q_init = tree.edge_q_init[b, node]
    else:  # loss
        q_init = jnp.zeros_like(expectation)
    q = jnp.where(visits > 0, expectation, q_init)

    u = prior * (c_puct * jnp.sqrt(n_parent))[:, None] / (1.0 + nf)
    util = q + u

    # proven edges pin the utility (reference: EdgeSelector.cpp:400-410)
    dist = S.get_distance(escore).astype(jnp.float32)
    util = jnp.where(S.is_win(escore), 1000.0 - dist, util)
    util = jnp.where(S.is_loss(escore), -1000.0 + dist, util)
    util = jnp.where(S.is_draw(escore) & S.is_finite(escore), 0.5, util)
    return jnp.where(valid, util, -jnp.inf)


def select_edge(
    tree: Tree, cfg: MCTSConfig, node: jax.Array, prior: jax.Array
) -> jax.Array:
    """Best edge slot [B] of `node` [B] by PUCT."""
    return jnp.argmax(_edge_utility(tree, cfg, node, prior), axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Expansion helpers
# ---------------------------------------------------------------------------


def _topk_edges(
    policy: jax.Array, legal: jax.Array, k: int, temperature: float
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Choose up to K edges by prior (reference: UnifiedGenerator prune +
    renormalize, EdgeGenerator.cpp:269-303).

    policy [B, H, W] masked probabilities; returns (actions [B,K] int32,
    priors [B,K] f32 renormalized, complete [B] bool: no legal move was
    dropped)."""
    bsz, h, w = policy.shape
    flat = policy.reshape(bsz, h * w)
    legal_flat = legal.reshape(bsz, h * w)
    if temperature != 1.0:
        flat = flat ** (1.0 / temperature)
    flat = jnp.where(legal_flat, jnp.maximum(flat, 1e-12), -1.0)
    vals, idxs = jax.lax.top_k(flat, k)
    keep = vals > 0.0
    priors = jnp.where(keep, vals, 0.0)
    priors = priors / jnp.maximum(priors.sum(-1, keepdims=True), 1e-12)
    actions = jnp.where(keep, idxs.astype(jnp.int32), NULL)
    complete = legal_flat.sum(-1) <= k
    return actions, priors, complete


def _edge_scores_from_analysis(
    board: jax.Array, analysis: static_solver.StaticAnalysis, actions: jax.Array
) -> jax.Array:
    """Gather static tactical scores [B, K] at the chosen edge actions
    (reference: the solver leg of the pipeline, Search::solve +
    UnifiedGenerator terminal checks, Search.cpp:159-183,
    EdgeGenerator.cpp:23-124)."""
    bsz, h, w = board.shape
    flat = analysis.action_scores.reshape(bsz, h * w)
    safe = jnp.clip(actions, 0, h * w - 1)
    escore = jnp.take_along_axis(flat, safe, -1)
    # last empty cell is a draw-in-1 unless it wins
    last_cell = ((board == V.NONE).sum((1, 2)) <= 1)[:, None]
    escore = jnp.where(last_cell & ~S.is_proven(escore), S.draw_in(1), escore)
    return jnp.where(actions != NULL, escore, S.zero()).astype(jnp.uint16)


def _evaluate(
    net_apply: Callable, variables: Any, tables: V.RuleTables, board, stm, raw_input: bool
):
    """NN forward on [B,H,W] boards: returns (policy [B,H,W] masked probs,
    value (win,draw) [B,2], q_expect [B,H,W], moves_left [B], legal mask)."""
    packed = F.encode(tables, board, stm)
    planes = F.unpack_raw_planes(packed) if raw_input else F.unpack_planes(packed)
    out = net_apply(variables, planes)
    legal = (packed & 1) == 1
    # renju-forbidden cells are excluded from expansion (reference:
    # UnifiedGenerator skips forbidden moves, EdgeGenerator.cpp:23-124)
    legal = legal & ~(((packed >> 6) & 1) == 1)
    neg = jnp.float32(-1e9)
    plogits = jnp.where(legal, out.policy_logits, neg)
    bsz = plogits.shape[0]
    policy = jax.nn.softmax(plogits.reshape(bsz, -1), -1).reshape(plogits.shape)
    wdl = jax.nn.softmax(out.value_logits, -1)
    value = jnp.stack([wdl[..., 0], wdl[..., 1]], -1)
    if out.q_logits is not None:
        qwdl = jax.nn.softmax(out.q_logits, -1)
        q_expect = qwdl[..., 0] + 0.5 * qwdl[..., 1]
    else:
        q_expect = jnp.zeros_like(policy)
    if out.moves_left_logits is not None:
        mdist = jax.nn.softmax(out.moves_left_logits, -1)
        moves_left = mdist @ jnp.arange(mdist.shape[-1], dtype=jnp.float32)
    else:
        moves_left = jnp.zeros((bsz,), jnp.float32)
    return policy, value, q_expect, moves_left, legal, packed


# ---------------------------------------------------------------------------
# The simulation step
# ---------------------------------------------------------------------------


class SearchState(NamedTuple):
    """Carry of the per-move search: tree + root position."""

    tree: Tree
    root_board: jax.Array  # [B, H, W] int8
    root_stm: jax.Array  # [B] int8 side to move at root
    noisy_prior: jax.Array  # [B, K] root priors with exploration noise
    sims_done: jax.Array  # [B] int32


def make_simulate_fn(
    net_apply: Callable,
    tables: V.RuleTables,
    cfg: MCTSConfig,
    raw_input: bool = True,
    profile_cutoff: str | None = None,
):
    """Build the jittable one-simulation step: (variables, state) -> state.

    One batched simulation across all B trees: PUCT descent carrying the
    board, terminal check, NN evaluation, expansion, and masked backup along
    the recorded path (reference pipeline: Search.cpp:117-232).

    profile_cutoff in {"select", "evaluate", "expand"} truncates the step
    after that phase (dev-only, for attributing step cost on hardware)."""

    D = cfg.max_depth
    K = cfg.max_edges

    def simulate(variables: Any, state: SearchState) -> SearchState:
        tree = state.tree
        bsz = tree.batch
        h, w = state.root_board.shape[1], state.root_board.shape[2]
        b = jnp.arange(bsz)

        # ------------------------------------------------------------------
        # SELECT (reference: Tree::select walk, Tree.cpp:226-251)
        # ------------------------------------------------------------------
        def descend(carry, _):
            cur, boardc, stm, steps, done, need_expand, move_r, move_c = carry
            prior = jnp.where(
                (cur == 0)[:, None], state.noisy_prior, tree.edge_prior[b, cur]
            )
            slot = select_edge(tree, cfg, cur, prior)
            action = tree.edge_action[b, cur, slot]
            child = tree.edge_child[b, cur, slot]
            # stop BEFORE stepping at: proven nodes (revisit, reference
            # REACHED_PROVEN_EDGE), edge-less nodes (capacity-overflow leaves)
            no_edges = tree.edge_action[b, cur, 0] == NULL
            proven = S.is_proven(tree.node_score[b, cur])
            stop_here = done | no_edges | proven

            take = ~stop_here
            r = jnp.clip(jnp.where(take, action, 0) // w, 0, h - 1)
            c = jnp.clip(jnp.where(take, action, 0) % w, 0, w - 1)
            cell_mask = (
                (jnp.arange(h, dtype=jnp.int32)[None, :, None] == r[:, None, None])
                & (jnp.arange(w, dtype=jnp.int32)[None, None, :] == c[:, None, None])
                & take[:, None, None]
            )
            boardc = jnp.where(cell_mask, stm[:, None, None], boardc)
            move_r = jnp.where(take, r, move_r)
            move_c = jnp.where(take, c, move_c)
            new_stm = jnp.where(
                take, jnp.where(stm == CROSS, CIRCLE, CROSS).astype(jnp.int8), stm
            )
            # stop AFTER stepping when the chosen edge had no child yet
            hit_unexpanded = take & (child == NULL)
            now_done = stop_here | hit_unexpanded
            new_cur = jnp.where(take & ~hit_unexpanded, child, cur)
            new_steps = steps + take.astype(jnp.int32)
            new_need = need_expand | hit_unexpanded
            out = (new_cur, boardc, new_stm, new_steps, now_done, new_need, move_r, move_c)
            path = (jnp.where(take, cur, NULL), jnp.where(take, slot, NULL))
            return out, path

        init = (
            jnp.zeros(bsz, jnp.int32),  # cur = root (node 0)
            state.root_board,
            state.root_stm,
            jnp.zeros(bsz, jnp.int32),  # steps
            jnp.zeros(bsz, bool),  # done
            jnp.zeros(bsz, bool),  # need_expand
            jnp.zeros(bsz, jnp.int32),
            jnp.zeros(bsz, jnp.int32),
        )
        carry_out, path = jax.lax.scan(descend, init, None, length=D)
        (leaf, sim_board, leaf_stm, steps, _, need_expand, last_r, last_c) = carry_out
        path_nodes, path_slots = path  # [D, B] with NULL beyond the path

        # last taken path entry = the edge into the reached position
        pn_t, ps_t = path_nodes.T, path_slots.T  # [B, D]
        last_i = jnp.clip(steps - 1, 0, D - 1)
        last_node = jnp.where(steps > 0, pn_t[b, last_i], NULL)
        last_slot = jnp.where(steps > 0, ps_t[b, last_i], 0)

        if profile_cutoff == "select":
            dep = steps + leaf + last_node + sim_board.sum((1, 2)).astype(jnp.int32)
            return state._replace(sims_done=state.sims_done + 1 + dep * 0)

        # ------------------------------------------------------------------
        # TERMINAL CHECK of the newly reached position (only meaningful where
        # we stepped onto an unexpanded edge)
        # ------------------------------------------------------------------
        mover = jnp.where(leaf_stm == CROSS, CIRCLE, CROSS).astype(jnp.int8)
        stones = (sim_board != V.NONE).sum((1, 2)).astype(jnp.int32)
        outcome = V.outcome_after(
            tables, sim_board, last_r, last_c, mover, stones, h * w
        )
        outcome = jnp.where(need_expand, outcome, jnp.int8(int(GameOutcome.UNKNOWN)))
        terminal = outcome != jnp.int8(int(GameOutcome.UNKNOWN))
        term_score = S.from_outcome(outcome, leaf_stm)  # leaf's own view

        # ------------------------------------------------------------------
        # EVALUATE all reached positions in one NN batch
        # ------------------------------------------------------------------
        policy, value, q_expect, moves_left, legal, packed = _evaluate(
            net_apply, variables, tables, sim_board, leaf_stm, raw_input
        )
        value = jnp.where(terminal[:, None], S.convert_to_value(term_score), value)

        leaf_proven = S.is_proven(tree.node_score[b, leaf])
        revisit_proven = (~need_expand) & leaf_proven
        start_value = jnp.where(
            revisit_proven[:, None],
            S.convert_to_value(tree.node_score[b, leaf]),
            value,
        )
        start_score = jnp.where(
            need_expand,
            term_score,
            jnp.where(revisit_proven, tree.node_score[b, leaf], S.zero()),
        )
        start_ml = moves_left

        if profile_cutoff == "evaluate":
            dep = (
                start_value.sum(-1)
                + policy.sum((1, 2))
                + q_expect.sum((1, 2))
                + start_score.astype(jnp.float32)
            )
            return state._replace(sims_done=state.sims_done + 1 + dep.astype(jnp.int32) * 0)

        # ------------------------------------------------------------------
        # EXPAND (reference: Tree::expand, Tree.cpp:257-298)
        # ------------------------------------------------------------------
        has_space = tree.node_count < tree.capacity
        do_expand = need_expand & has_space
        new_idx = jnp.where(do_expand, tree.node_count, 0)

        # static solver restricts generated moves (must-defend) and scores
        # tactical edges before the policy prior is consulted
        analysis = static_solver.analyze(packed, legal)
        actions, priors, complete = _topk_edges(
            policy, analysis.restrict, K, cfg.policy_expansion_temperature
        )
        actions = jnp.where((~terminal)[:, None], actions, NULL)
        qv = q_expect.reshape(bsz, h * w)
        safe_act = jnp.clip(actions, 0, h * w - 1)
        q_init = jnp.where(actions != NULL, jnp.take_along_axis(qv, safe_act, -1), 0.0)

        edge_scores0 = _edge_scores_from_analysis(sim_board, analysis, actions)
        best_edge = jnp.max(
            jnp.where(actions != NULL, edge_scores0, jnp.asarray(S.MINUS_INF)), -1
        ).astype(jnp.uint16)
        new_node_score = jnp.where(
            terminal,
            term_score,
            jnp.where(
                S.is_win(best_edge),
                best_edge,
                analysis.node_score,
            ),
        ).astype(jnp.uint16)
        start_score = jnp.where(need_expand, new_node_score, start_score)
        start_value = jnp.where(
            (need_expand & S.is_proven(new_node_score))[:, None],
            S.convert_to_value(new_node_score),
            start_value,
        )

        # writes are full-array one-hot selects: TPU scatters at per-batch
        # row indices serialize over the batch, while a masked select is one
        # streaming pass over a contiguous array
        n_iota = jnp.arange(tree.capacity, dtype=jnp.int32)[None, :]  # [1, N]
        row_mask = (n_iota == new_idx[:, None]) & do_expand[:, None]  # [B, N]

        def upd(arr, value_new):
            extra = arr.ndim - 2
            m = row_mask.reshape(row_mask.shape + (1,) * extra)
            v = jnp.asarray(value_new)
            if v.ndim <= 1:
                v = v.reshape((-1, 1) + (1,) * extra)
            else:
                v = v.reshape((bsz, 1) + v.shape[1:])
            return jnp.where(m, v, arr)

        tree = tree._replace(
            node_visits=upd(tree.node_visits, jnp.ones(bsz, jnp.int32)),
            node_value_sum=upd(tree.node_value_sum, start_value),
            node_score=upd(tree.node_score, new_node_score),
            node_moves_left_sum=upd(tree.node_moves_left_sum, moves_left),
            node_complete=upd(tree.node_complete, complete & ~terminal),
            edge_action=upd(tree.edge_action, actions),
            edge_child=upd(tree.edge_child, jnp.full((bsz, K), NULL)),
            edge_prior=upd(tree.edge_prior, priors),
            edge_visits=upd(tree.edge_visits, jnp.zeros((bsz, K), jnp.int32)),
            edge_value_sum=upd(tree.edge_value_sum, jnp.zeros((bsz, K, 2), jnp.float32)),
            edge_score=upd(tree.edge_score, edge_scores0),
            edge_q_init=upd(tree.edge_q_init, q_init),
            node_count=tree.node_count + do_expand.astype(jnp.int32),
        )
        # link the parent edge to the new node (one-hot select)
        link_node = jnp.where(do_expand, last_node, NULL)
        link_slot = jnp.where(do_expand, last_slot, 0)
        k_iota_b = jnp.arange(K, dtype=jnp.int32)[None, :]
        link_mask = (n_iota == link_node[:, None])[:, :, None] & (
            k_iota_b == link_slot[:, None]
        )[:, None, :]
        tree = tree._replace(
            edge_child=jnp.where(link_mask, new_idx[:, None, None], tree.edge_child)
        )

        if profile_cutoff == "expand":
            dep = tree.node_count + tree.edge_child[:, 0, 0]
            return state._replace(
                tree=tree, sims_done=state.sims_done + 1 + dep * 0
            )

        # leaf-node stat update for non-expanding visits (revisits of proven
        # nodes / depth cutoffs); reference backup touches every traced node
        leaf_touch = (~need_expand) & (steps > 0)
        leaf_mask = (n_iota == leaf[:, None]) & leaf_touch[:, None]  # [B, N]
        tree = tree._replace(
            node_visits=tree.node_visits + leaf_mask.astype(jnp.int32),
            node_value_sum=tree.node_value_sum
            + jnp.where(leaf_mask[..., None], start_value[:, None, :], 0.0),
            node_moves_left_sum=tree.node_moves_left_sum
            + jnp.where(leaf_mask, start_ml[:, None], 0.0),
        )

        # ------------------------------------------------------------------
        # BACKUP (reference: Tree::backup, Tree.cpp:299-351)
        #
        # Two phases to keep HBM traffic flat in batch size: visit/value
        # statistics go in via ONE batched scatter-add per array (the value
        # seen at path depth d is a closed form of the leaf value — it flips
        # perspective (steps-d) times), and only the proven-score minimax —
        # inherently sequential — runs as a scan, over small gathered path
        # rows, with two final scatters.  A naive per-ply scatter scan makes
        # XLA copy the multi-hundred-MB edge arrays every ply.
        # ------------------------------------------------------------------
        minus_inf = jnp.asarray(S.MINUS_INF)
        valid_bd = pn_t != NULL  # [B, D]
        nd_bd = jnp.where(valid_bd, pn_t, 0)
        sl_bd = jnp.where(valid_bd, ps_t, 0)
        bb = b[:, None]

        # phase A: closed-form values along the path
        d_idx = jnp.arange(D, dtype=jnp.int32)[None, :]  # [1, D]
        flips = steps[:, None] - d_idx  # [B, D]
        odd = (flips & 1) == 1
        inv_value = S.value_invert(start_value)
        val_bd = jnp.where(odd[..., None], inv_value[:, None, :], start_value[:, None, :])
        ml_bd = start_ml[:, None] + flips.astype(jnp.float32)
        vsel = jnp.where(valid_bd[..., None], val_bd, 0.0)

        # updates become dense deltas via one-hot einsum on the MXU, then one
        # streaming add per array (scatters at per-batch indices serialize on
        # TPU).  Path nodes are distinct within a path, so every (node, slot)
        # receives at most one contribution and integer sums stay exact.
        k_iota_row = jnp.arange(K, dtype=jnp.int32)[None, None, :]  # [1,1,K]
        slot_hit = (k_iota_row == sl_bd[..., None]) & valid_bd[..., None]  # [B,D,K]
        ev_rows_add = jnp.where(slot_hit[..., None], val_bd[:, :, None, :], 0.0)
        onehot_nd = (
            (n_iota[:, None, :] == nd_bd[:, :, None]) & valid_bd[..., None]
        ).astype(jnp.float32)  # [B, D, N]

        delta_ev = jnp.einsum("bdn,bdkc->bnkc", onehot_nd, ev_rows_add)
        delta_evis = jnp.einsum(
            "bdn,bdk->bnk", onehot_nd, slot_hit.astype(jnp.float32)
        )
        delta_nvis = jnp.einsum(
            "bdn,bd->bn", onehot_nd, valid_bd.astype(jnp.float32)
        )
        delta_nval = jnp.einsum("bdn,bdc->bnc", onehot_nd, vsel)
        delta_nml = jnp.einsum(
            "bdn,bd->bn", onehot_nd, jnp.where(valid_bd, ml_bd, 0.0)
        )
        tree = tree._replace(
            edge_value_sum=tree.edge_value_sum + delta_ev,
            edge_visits=tree.edge_visits + jnp.round(delta_evis).astype(jnp.int32),
            node_visits=tree.node_visits + jnp.round(delta_nvis).astype(jnp.int32),
            node_value_sum=tree.node_value_sum + delta_nval,
            node_moves_left_sum=tree.node_moves_left_sum + delta_nml,
        )

        # phase B: proven-score minimax over the gathered path rows
        es_rows = tree.edge_score[bb, nd_bd]  # [B, D, K] uint16
        ea_rows = tree.edge_action[bb, nd_bd] != NULL  # [B, D, K]
        comp_rows = tree.node_complete[bb, nd_bd]  # [B, D]
        ns_rows = tree.node_score[bb, nd_bd]  # [B, D]
        k_iota = jnp.arange(K, dtype=jnp.int32)[None, :]

        def score_step(child_score, d):
            vd = valid_bd[:, d]
            pscore = S.invert_up(child_score)
            old_e = es_rows[:, d, :]
            sl = sl_bd[:, d]
            e_at_slot = jnp.take_along_axis(old_e, sl[:, None], -1)[:, 0]
            e_new = jnp.where(vd & S.is_proven(pscore), pscore, e_at_slot).astype(
                jnp.uint16
            )
            row = jnp.where(k_iota == sl[:, None], e_new[:, None], old_e)
            ea = ea_rows[:, d, :]
            best = jnp.max(jnp.where(ea, row, minus_inf), -1).astype(jnp.uint16)
            all_proven = jnp.all(S.is_proven(row) | ~ea, -1)
            provable = S.is_win(best) | (
                all_proven & comp_rows[:, d] & S.is_proven(best)
            )
            ns_new = jnp.where(vd & provable, best, ns_rows[:, d]).astype(jnp.uint16)
            nxt = jnp.where(vd, ns_new, child_score)
            return nxt, (e_new, ns_new)

        _, (e_new_all, ns_new_all) = jax.lax.scan(
            score_step, start_score, jnp.arange(D - 1, -1, -1)
        )
        # outputs are ordered leaf->root; map back to path order
        e_new_bd = e_new_all[::-1].T  # [B, D]
        ns_new_bd = ns_new_all[::-1].T
        # score writes as dense mod-2^16 DELTA adds via the same one-hot
        # einsum; deltas split into exact hi/lo bytes so the matmul passes
        # stay integer-exact regardless of matmul precision
        e_old_bd = jnp.take_along_axis(
            es_rows, sl_bd[..., None], -1
        )[..., 0]  # [B, D] pre-update values at the path slots
        e_delta = (
            e_new_bd.astype(jnp.int32) - e_old_bd.astype(jnp.int32)
        ) & 0xFFFF
        e_delta = jnp.where(valid_bd, e_delta, 0)
        ns_delta = (
            ns_new_bd.astype(jnp.int32) - ns_rows.astype(jnp.int32)
        ) & 0xFFFF
        ns_delta = jnp.where(valid_bd, ns_delta, 0)

        def byte_einsum(delta_bd, rows: bool):
            """Exact [B, N(, K)] uint16 delta from per-path deltas [B, D]."""
            hi = (delta_bd >> 8).astype(jnp.float32)
            lo = (delta_bd & 0xFF).astype(jnp.float32)
            if rows:
                hi = jnp.where(k_iota_row == sl_bd[..., None], hi[..., None], 0.0)
                lo = jnp.where(k_iota_row == sl_bd[..., None], lo[..., None], 0.0)
                out = jnp.einsum("bdn,bdk->bnk", onehot_nd, hi) * 256.0 + jnp.einsum(
                    "bdn,bdk->bnk", onehot_nd, lo
                )
            else:
                out = jnp.einsum("bdn,bd->bn", onehot_nd, hi) * 256.0 + jnp.einsum(
                    "bdn,bd->bn", onehot_nd, lo
                )
            return jnp.round(out).astype(jnp.uint16)

        tree = tree._replace(
            edge_score=tree.edge_score + byte_einsum(e_delta, rows=True),
            node_score=tree.node_score + byte_einsum(ns_delta, rows=False),
        )

        return SearchState(
            tree=tree,
            root_board=state.root_board,
            root_stm=state.root_stm,
            noisy_prior=state.noisy_prior,
            sims_done=state.sims_done + 1,
        )

    return simulate


# ---------------------------------------------------------------------------
# Root initialization + search driver
# ---------------------------------------------------------------------------


def init_root(
    net_apply: Callable,
    variables: Any,
    tables: V.RuleTables,
    cfg: MCTSConfig,
    board: jax.Array,
    stm: jax.Array,
    raw_input: bool = True,
    noise_key: jax.Array | None = None,
) -> SearchState:
    """Create fresh trees with the root (node 0) expanded, optionally with
    Dirichlet exploration noise on the root priors
    (reference: EdgeSelector.cpp applyDirichletNoise)."""
    bsz, h, w = board.shape
    tree = init_tree(bsz, cfg)
    policy, value, q_expect, moves_left, legal, packed = _evaluate(
        net_apply, variables, tables, board, stm, raw_input
    )
    analysis = static_solver.analyze(packed, legal)
    actions, priors, complete = _topk_edges(
        policy, analysis.restrict, cfg.max_edges, cfg.policy_expansion_temperature
    )
    qv = q_expect.reshape(bsz, h * w)
    safe_act = jnp.clip(actions, 0, h * w - 1)
    q_init = jnp.where(actions != NULL, jnp.take_along_axis(qv, safe_act, -1), 0.0)
    edge_scores0 = _edge_scores_from_analysis(board, analysis, actions)
    best_edge = jnp.max(
        jnp.where(actions != NULL, edge_scores0, jnp.asarray(S.MINUS_INF)), -1
    ).astype(jnp.uint16)
    root_score = jnp.where(
        S.is_win(best_edge), best_edge, analysis.node_score
    ).astype(jnp.uint16)
    tree = tree._replace(
        node_visits=tree.node_visits.at[:, 0].set(1),
        node_value_sum=tree.node_value_sum.at[:, 0].set(value),
        node_score=tree.node_score.at[:, 0].set(root_score),
        node_moves_left_sum=tree.node_moves_left_sum.at[:, 0].set(moves_left),
        node_complete=tree.node_complete.at[:, 0].set(complete),
        edge_action=tree.edge_action.at[:, 0].set(actions),
        edge_prior=tree.edge_prior.at[:, 0].set(priors),
        edge_score=tree.edge_score.at[:, 0].set(edge_scores0),
        edge_q_init=tree.edge_q_init.at[:, 0].set(q_init),
        node_count=jnp.ones(bsz, jnp.int32),
    )
    noisy = priors
    if noise_key is not None and cfg.noise_weight > 0.0:
        noise = jax.random.dirichlet(
            noise_key, jnp.full((cfg.max_edges,), cfg.noise_alpha), (bsz,)
        )
        noisy = jnp.where(
            actions != NULL,
            (1.0 - cfg.noise_weight) * priors + cfg.noise_weight * noise,
            0.0,
        )
        noisy = noisy / jnp.maximum(noisy.sum(-1, keepdims=True), 1e-12)
    return SearchState(
        tree=tree,
        root_board=board,
        root_stm=stm,
        noisy_prior=noisy,
        sims_done=jnp.zeros(bsz, jnp.int32),
    )


def run_search(
    net_apply: Callable,
    variables: Any,
    tables: V.RuleTables,
    cfg: MCTSConfig,
    board: jax.Array,
    stm: jax.Array,
    num_simulations: int,
    raw_input: bool = True,
    noise_key: jax.Array | None = None,
) -> SearchState:
    """Full search: init root + `num_simulations` batched simulations under
    one lax.scan (jit the caller; everything stays on device)."""
    state = init_root(
        net_apply, variables, tables, cfg, board, stm, raw_input, noise_key
    )
    simulate = make_simulate_fn(net_apply, tables, cfg, raw_input)

    def step(s, _):
        return simulate(variables, s), None

    state, _ = jax.lax.scan(step, state, None, length=num_simulations)
    return state


# ---------------------------------------------------------------------------
# Extracting results
# ---------------------------------------------------------------------------


def root_visit_distribution(state: SearchState) -> jax.Array:
    """Normalized root visit counts as a [B, H, W] policy target
    (reference: SearchDataPack built from root, data_packs.cpp:24-43)."""
    tree = state.tree
    bsz = tree.batch
    h, w = state.root_board.shape[1], state.root_board.shape[2]
    visits = tree.edge_visits[:, 0].astype(jnp.float32)  # [B, K]
    actions = tree.edge_action[:, 0]
    valid = actions != NULL
    visits = jnp.where(valid, visits, 0.0)
    dist = jnp.zeros((bsz, h * w), jnp.float32)
    dist = dist.at[jnp.arange(bsz)[:, None], jnp.clip(actions, 0, h * w - 1)].add(
        visits
    )
    dist = dist / jnp.maximum(dist.sum(-1, keepdims=True), 1e-12)
    return dist.reshape(bsz, h, w)


def root_value(state: SearchState) -> jax.Array:
    """Root (win, draw) estimate [B, 2]."""
    tree = state.tree
    n = jnp.maximum(tree.node_visits[:, 0].astype(jnp.float32), 1.0)
    return tree.node_value_sum[:, 0] / n[:, None]


def select_move(
    state: SearchState,
    key: jax.Array | None = None,
    temperature: float = 0.0,
) -> jax.Array:
    """Final move [B] (flat action index): argmax visits, or visit-count
    sampling with temperature (reference: BestEdgeSelector / final selector
    sampling in GameGenerator.cpp:145-173).  Proven WIN edges dominate,
    proven LOSS edges are avoided (reference: BestEdgeSelector ordering)."""
    tree = state.tree
    visits = tree.edge_visits[:, 0].astype(jnp.float32)
    actions = tree.edge_action[:, 0]
    escore = tree.edge_score[:, 0]
    valid = actions != NULL
    h, w = state.root_board.shape[1], state.root_board.shape[2]

    if key is not None and temperature > 0.0:
        logits = jnp.where(
            valid, jnp.log(jnp.maximum(visits, 1e-9)) / temperature, -jnp.inf
        )
        slot = jax.random.categorical(key, logits, axis=-1)
    else:
        n = jnp.maximum(visits, 1.0)
        ev = tree.edge_value_sum[:, 0]
        q = (ev[..., 0] + 0.5 * ev[..., 1]) / n
        util = visits + q
        dist = S.get_distance(escore).astype(jnp.float32)
        util = jnp.where(S.is_win(escore), 1e9 - dist, util)
        util = jnp.where(S.is_loss(escore), -1e9 + dist + visits * 1e-6, util)
        util = jnp.where(valid, util, -jnp.inf)
        slot = jnp.argmax(util, axis=-1)
    b = jnp.arange(tree.batch)
    return jnp.clip(actions[b, slot], 0, h * w - 1)
