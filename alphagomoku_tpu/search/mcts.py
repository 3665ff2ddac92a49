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

- Transpositions (reference: the NodeCache hash-table tree,
  NodeCache.hpp:51-120) are handled by an on-device hash probe: every node
  stores its 64-bit zobrist position hash, expansion first probes the
  existing nodes, and a hit links the edge to the existing node instead of
  allocating — the tree is a DAG, exactly like the reference's.  Cycles are
  impossible (stone count increases monotonically with depth).
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
from . import zobrist

NULL = jnp.int32(-1)


class MCTSConfig(NamedTuple):
    """Search configuration (reference: utils/configs.hpp MCTSConfig +
    EdgeSelectorConfig + TreeConfig)."""

    max_nodes: int = 1024
    max_edges: int = 32  # max_children (reference default from auto-config)
    max_depth: int = 48
    policy: str = "puct"  # puct | puct_fpu | puct_variance | ucb | lcb |
    # thompson | kl_ucb | bayes_ucb | learnable (reference: EdgeSelector
    # registry selectable by config string, EdgeSelector.cpp:680-712)
    exploration_constant: float = 1.25  # c_puct
    exploration_scaling: float = 0.0  # * log(parent visits)
    fpu_reduction: float = 0.25  # puct_fpu: first-play urgency below parent Q
    init_to: str = "parent"  # loss | draw | parent | q_head
    policy_expansion_temperature: float = 1.0
    noise_weight: float = 0.0  # root exploration noise (selfplay)
    noise_alpha: float = 0.1
    noise_type: str = "dirichlet"  # dirichlet | gumbel | custom (reference:
    # applyDirichlet/Gumbel/CustomNoise, EdgeSelector.cpp:602-625)
    leaf_batch: int = 1  # simulations selected per step under virtual loss
    # (reference: SearchTaskList batching, Search.hpp:56-96)
    use_transpositions: bool = True  # hash-probe node sharing (reference:
    # NodeCache transposition tree, NodeCache.hpp:51-120)
    symmetry_averaging: bool = False  # random symmetry per NN evaluation
    # (reference: NNEvaluator augmentation, NNEvaluator.cpp:134-141)
    leaf_solver: str = "none"  # none | vcf | vct: budgeted proof search on
    # every leaf batch, fused into the step — proven wins override node and
    # edge scores and force the winning move into expansion (reference: the
    # per-leaf AlphaBetaSearch::solve leg, Search.cpp:159-183)
    leaf_solver_steps: int = 24  # lockstep transitions per leaf batch
    leaf_solver_depth: int = 6  # attacker plies
    leaf_solver_threes: int = 2  # vct only: open-three budget per line
    leaf_solver_cap: int = 0  # >0: solve only the top-`cap` leaves that
    # have any attacker threat cell (compacted via one-hot einsum); quiet
    # leaves have no forcing candidates and would fail at step 1 anyway,
    # so skipping them preserves every proof while cutting the solver's
    # lockstep width ~4-8x (reference analogue: TSS exits immediately on
    # an empty threat histogram, ThreatSpaceSearch.cpp:176-190)
    loss_prover: bool = False  # prove LOSSES for the leaf side-to-move by
    # refuting its complete defensive option set (reference: the fail-low
    # leg of the per-leaf alpha-beta, AlphaBetaSearch.cpp:91-135; here
    # vct_batched.solve_loss).  Proven-lost leaves get node_score =
    # loss_in(d); descents then stop at them (proven) and the parent edge
    # reads the win through invert_up in the minimax backup.
    loss_cap: int = 64  # leaves per batch sent to the loss prover (top-k
    # compacted by opponent-threat evidence, like leaf_solver_cap)
    loss_options: int = 8  # max defensive options refuted per leaf
    draw_after: int = 0  # stones after which the game is adjudicated a draw
    # (reference: GameConfig::draw_after).  0 = board area.  Enables DRAW
    # proving: terminal checks use the horizon, the static solver gains the
    # draw_in_1 stage + the reference's distance gating, and solver mates
    # longer than the remaining distance are discarded
    # (MoveGenerator.cpp:162-186, Score.hpp:285-317).


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
    edge_action: jax.Array  # [B, N, K] int16 (r*W + c; -1 empty slot)
    edge_child: jax.Array  # [B, N, K] int16 (-1 unexpanded)
    edge_prior: jax.Array  # [B, N, K] bf16
    # NOTE on edge statistics: the reference stores visit/value/score per
    # Edge (Edge.hpp).  Here edge VISITS and VALUES are DERIVED from the
    # CHILD NODE via `edge_stats` — in a pure tree this is numerically the
    # reference's accounting (every path through an edge continues into its
    # unique child and the child's creation visit stands in for the edge's
    # first backup); through transpositions (DAG) the statistics are SHARED
    # across parents, i.e. graph-MCTS semantics.  This removes the two
    # largest per-edge mutable arrays from the hot step: value backup
    # touches only [B, N] node arrays (the [B, N, K] stat updates measured
    # ~3.5 ms/step at the bench config).  `edge_score` stays STORED and is
    # minimax-updated in backup via one-hot einsum byte read/write (the
    # reference's Edge::setScore) — deriving it from child node scores
    # would need [B, P, K]-indexed gathers in backup, which XLA compiles
    # to serialized loop-fusions in this context (measured 6.9 ms/step).
    edge_score: jax.Array  # [B, N, K] uint16 packed solver/minimax score
    edge_q_init: jax.Array  # [B, N, K] bf16 (q-head prior expectation)
    node_hash: jax.Array  # [B, N, 2] uint32 position hash (transpositions)
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
        edge_action=jnp.full((batch, n, k), -1, jnp.int16),
        edge_child=jnp.full((batch, n, k), -1, jnp.int16),
        edge_prior=jnp.zeros((batch, n, k), jnp.bfloat16),
        edge_score=jnp.full((batch, n, k), S.zero()),
        edge_q_init=jnp.zeros((batch, n, k), jnp.bfloat16),
        node_hash=jnp.zeros((batch, n, 2), jnp.uint32),
        node_count=jnp.zeros(batch, jnp.int32),
    )


class EdgeStats(NamedTuple):
    visits: jax.Array  # [..., K] int32 (0 for unexpanded edges)
    q_win: jax.Array  # [..., K] f32 parent-perspective win rate
    q_draw: jax.Array  # [..., K] f32 draw rate
    score: jax.Array  # [..., K] uint16 live packed score (stored array)
    child: jax.Array  # [..., K] int32 child ids (-1 unexpanded)


def pack_node_stats(tree: Tree) -> jax.Array:
    """[B, N, 3] f32 (visits, win_sum, draw_sum) — packing once per step
    lets every descent iteration read child statistics with ONE gather
    instead of two (the descent while_loop is latency-bound; visit counts
    are exact in f32 up to 2^24, far above any search budget here)."""
    return jnp.concatenate(
        [tree.node_visits.astype(jnp.float32)[..., None], tree.node_value_sum],
        axis=-1,
    )


def edge_stats_of_rows(
    tree: Tree,
    child: jax.Array,
    stored: jax.Array,
    packed: jax.Array | None = None,
) -> EdgeStats:
    """Derived edge statistics for arbitrary [..., K] child-id rows (see
    the Tree docstring): visits/values come from the child node inverted
    to the parent perspective; the score is the stored per-edge array
    (minimax-updated in backup, exactly the reference's Edge::setScore)."""
    child = child.astype(jnp.int32)
    has = child >= 0
    cs = jnp.clip(child, 0, tree.capacity - 1)
    flat_idx = cs.reshape(cs.shape[0], -1)
    if packed is not None:
        st = jnp.take_along_axis(packed, flat_idx[..., None], 1).reshape(
            cs.shape + (3,)
        )
        nvf = st[..., 0]
        nvs = st[..., 1:3]
        visits = jnp.where(has, nvf.astype(jnp.int32), 0)
    else:
        nv = jnp.take_along_axis(tree.node_visits, flat_idx, 1).reshape(cs.shape)
        nvs = jnp.take_along_axis(
            tree.node_value_sum, flat_idx[..., None], 1
        ).reshape(cs.shape + (2,))
        visits = jnp.where(has, nv, 0)
    denom = jnp.maximum(visits.astype(jnp.float32), 1.0)
    w_c = nvs[..., 0] / denom
    d_c = nvs[..., 1] / denom
    q_win = jnp.where(has, 1.0 - w_c - d_c, 0.0)
    q_draw = jnp.where(has, d_c, 0.0)
    return EdgeStats(visits, q_win, q_draw, stored.astype(jnp.uint16), child)


def edge_stats(
    tree: Tree,
    b: jax.Array,
    node: jax.Array,
    packed: jax.Array | None = None,
) -> EdgeStats:
    """Derived edge statistics [B, K] for one node row per tree."""
    child = tree.edge_child[b, node].astype(jnp.int32)
    stored = tree.edge_score[b, node]
    return edge_stats_of_rows(tree, child, stored, packed)


# ---------------------------------------------------------------------------
# PUCT selection over the K edge slots of one node per tree
# ---------------------------------------------------------------------------


def _fit_kl(p: jax.Array, t: jax.Array, iters: int = 24) -> jax.Array:
    """Upper-confidence q solving KL(p||q) = t by damped Newton iteration
    (reference: KLUCB::fit_kl, EdgeSelector.cpp:258-277; the reference's
    early-exit-at-1e-3 loop becomes a fixed-iteration jittable loop)."""
    eps = 1e-9

    def log_eps(x):
        return jnp.log(jnp.maximum(x, eps))

    rhs = p * log_eps(p) + (1.0 - p) * log_eps(1.0 - p) - t
    q0 = 0.5 * (1.0 + p)

    def body(_, q):
        f = p * log_eps(q) + (1.0 - p) * log_eps(1.0 - q) - rhs
        df = (p - q) / jnp.maximum(q * (1.0 - q), eps)
        df = jnp.where(jnp.abs(df) > 1e-12, df, -1e-12)
        step = 0.9 * (1.0 - q)
        qn = q - jnp.maximum(-step, f / df)
        return jnp.clip(qn, eps, 1.0 - eps)

    return jax.lax.fori_loop(0, iters, body, q0)


def _hash_uniform(*ints: jax.Array) -> jax.Array:
    """Cheap deterministic pseudo-uniform in [0, 1) from integer streams —
    stands in for the reference's thread-local randFloat() inside the jitted
    step (the stream varies per node/slot/visit so repeated selections see
    fresh draws)."""
    acc = jnp.zeros_like(jnp.broadcast_arrays(*ints)[0], jnp.uint32)
    for i, x in enumerate(ints):
        acc = (acc ^ x.astype(jnp.uint32)) * jnp.uint32(2654435761 + 2 * i)
        acc = acc ^ (acc >> 15)
    return (acc >> 8).astype(jnp.float32) / jnp.float32(1 << 24)


def _edge_utility(
    tree: Tree,
    cfg: MCTSConfig,
    node: jax.Array,
    prior: jax.Array,
    vl: jax.Array | None = None,
    is_root: jax.Array | None = None,
    tp_params: Any = None,
    packed: jax.Array | None = None,
) -> jax.Array:
    """In-tree edge utility [B, K] for the edges of `node` [B], per
    cfg.policy (reference: the EdgeSelector op family,
    EdgeSelector.cpp:129-470 and the create registry :680-712).
    `vl` [B, K] counts virtual visits from other in-flight leaf selections;
    `is_root` [B] marks trees whose current node is the search root
    (the learnable policy runs its MLP there); `tp_params` are the
    LearnablePolicySelector MLP parameters; `packed` is an optional
    pack_node_stats(tree) snapshot (the tree is frozen during select)."""
    b = jnp.arange(tree.batch)
    es = edge_stats(tree, b, node, packed)
    visits = es.visits
    qw_e, qd_e = es.q_win, es.q_draw
    escore = es.score
    valid = tree.edge_action[b, node] != NULL

    if packed is not None:
        prow = packed[b, node]  # [B, 3]
        n_parent = prow[..., 0]
        pv_sum = prow[..., 1:3]
    else:
        n_parent = tree.node_visits[b, node].astype(jnp.float32)
        pv_sum = tree.node_value_sum[b, node]
    c_puct = cfg.exploration_constant + cfg.exploration_scaling * jnp.log(
        jnp.maximum(n_parent, 1.0)
    )
    # the bandit selectors hardcode this schedule in the reference
    # (EdgeSelector.cpp: "0.25f + 0.073f * std::log(...)")
    c_bandit = 0.25 + 0.073 * jnp.log(jnp.maximum(n_parent, 1.0))

    nf = visits.astype(jnp.float32)
    expectation = qw_e + 0.5 * qd_e
    pn = jnp.maximum(n_parent, 1.0)
    parent_q = ((pv_sum[..., 0] + 0.5 * pv_sum[..., 1]) / pn)[:, None]
    parent_wdl = pv_sum / pn[:, None]
    if cfg.policy == "puct_fpu":
        # first-play urgency: unvisited edges start below the parent value
        # (reference: PUCTfpuSelector, EdgeSelector.cpp:862-890)
        q_init = jnp.broadcast_to(
            jnp.maximum(parent_q - cfg.fpu_reduction, 0.0), expectation.shape
        )
    elif cfg.policy in ("puct_variance", "learnable"):
        # q-head ops: unvisited edges read the network's action value
        # (reference: PUCT_q_head, EdgeSelector.cpp:343-388)
        q_init = tree.edge_q_init[b, node].astype(jnp.float32)
    elif cfg.init_to == "parent":
        q_init = jnp.broadcast_to(parent_q, expectation.shape)
    elif cfg.init_to == "draw":
        q_init = jnp.full_like(expectation, 0.5)
    elif cfg.init_to == "q_head":
        q_init = tree.edge_q_init[b, node].astype(jnp.float32)
    else:  # loss
        q_init = jnp.zeros_like(expectation)
    q = jnp.where(visits > 0, expectation, q_init)

    if vl is not None:
        # virtual loss across the in-flight leaf batch (reference: Edge
        # virtual_loss + is_being_expanded, Edge.hpp:25,148-151): virtual
        # visits count as losses, and an unvisited edge already being
        # expanded by an earlier sub-simulation is strongly avoided
        vlf = vl.astype(jnp.float32)
        q = q * nf / jnp.maximum(nf + vlf, 1.0)
        q = jnp.where((visits == 0) & (vl > 0), -1000.0, q)
        n_parent = n_parent + vlf.sum(-1)
        nf = nf + vlf

    if cfg.policy == "ucb":
        # prior-free UCB1 (reference: UCBSelector, EdgeSelector.cpp:424+)
        u = cfg.exploration_constant * jnp.sqrt(
            jnp.log(jnp.maximum(n_parent, 1.0))[:, None] / (1.0 + nf)
        )
        util = q + u
    elif cfg.policy == "lcb":
        # LOWER confidence bound: conservative final-ish policy
        # (reference: LCB op, EdgeSelector.cpp:446-470)
        q_lcb = jnp.where(visits > 0, q, jnp.broadcast_to(parent_q, q.shape))
        u = cfg.exploration_constant * jnp.sqrt(
            jnp.log(jnp.maximum(n_parent, 1.0))[:, None] / (1.0 + nf)
        )
        util = q_lcb - u
        # only LOSS is pinned for LCB (reference pins just the loss case)
        dist = S.get_distance(escore).astype(jnp.float32)
        util = jnp.where(S.is_loss(escore), -1.0e6 + dist + prior, util)
        return jnp.where(valid, util, -jnp.inf)
    elif cfg.policy == "thompson":
        # active reference code is ThompsonSamplingNormal with the variance
        # term disabled (EdgeSelector.cpp:129-218: variance = 0, so the
        # gaussian collapses to its mean): mean + exploration term, with
        # unvisited means fitted from the prior via the inverse error
        # function (fit_mean with best_mean=0, variance 2*0.6)
        fit0 = jnp.sqrt(2.0 * (0.6 + 0.6)) * jax.scipy.special.erfinv(
            jnp.clip(2.0 * prior - 1.0, -0.999999, 0.999999)
        )
        mean = jnp.where(visits > 0, q, fit0)
        u = prior * (c_bandit * jnp.sqrt(n_parent))[:, None] / (1.0 + nf)
        util = mean + u
    elif cfg.policy == "bayes_ucb":
        # posterior-quantile selection; with the variance term disabled the
        # visited quantile is the mean, unvisited edges fit the prior
        # quantile at variance best+prior = 20 (reference: BayesUCB,
        # EdgeSelector.cpp:278-342)
        fit0 = jnp.sqrt(2.0 * 20.0) * jax.scipy.special.erfinv(
            jnp.clip(2.0 * prior - 1.0, -0.999999, 0.999999)
        )
        util = jnp.where(visits > 0, q, fit0)
    elif cfg.policy == "kl_ucb":
        # KL-UCB (reference: KLUCB op, EdgeSelector.cpp:215-277): visited
        # edges take the KL upper bound; unvisited edges draw a bernoulli
        # boost from the prior
        t_kl = jnp.log(jnp.maximum(n_parent, 1.0))[:, None] / jnp.maximum(nf, 1.0)
        q_kl = _fit_kl(jnp.clip(q, 0.0, 1.0), t_kl)
        u = prior / (1.0 + nf)
        rnd = _hash_uniform(
            node[:, None] + jnp.zeros_like(visits),
            jnp.arange(visits.shape[-1], dtype=jnp.int32)[None, :]
            + jnp.zeros_like(visits),
            n_parent.astype(jnp.int32)[:, None] + jnp.zeros_like(visits),
        )
        unvisited = jnp.where(rnd <= prior, 100.0 + prior, prior)
        util = jnp.where(visits > 0, q_kl + u, unvisited)
    elif cfg.policy == "puct_variance":
        # exploration scaled by the dispersion of visited-edge values
        # (reference: PUCTvarianceSelector::select, EdgeSelector.cpp:1255+)
        visited = (visits > 0) & valid
        vcount = visited.sum(-1).astype(jnp.float32)
        sum_visits = jnp.where(visited, nf, 0.0).sum(-1)
        avg = jnp.where(visited, expectation * nf, 0.0).sum(-1) / jnp.maximum(
            sum_visits, 1.0
        )
        var = jnp.where(visited, (expectation - avg[:, None]) ** 2 * nf, 0.0).sum(-1)
        scale = jnp.where(
            vcount > 1.0,
            jnp.sqrt(
                vcount * var / jnp.maximum((vcount - 1.0) * sum_visits, 1.0)
            ),
            1.0,
        )
        util = q + prior * (cfg.exploration_constant * scale)[:, None]
    elif cfg.policy == "learnable":
        # LearnablePolicySelector (reference: EdgeSelector.cpp:735-860):
        # at the root an MLP over 8 edge features produces logits sampled
        # with a visit-scaled temperature (gumbel-max = exact softmax
        # sampling); below the root, PUCT_q_head with the reference's
        # hardcoded c = 0.4062 + 0.1585 * log(N)
        from . import tree_policy as TP

        c_learn = 0.4062 + 0.1585 * jnp.log(jnp.maximum(n_parent, 1.0))
        u = prior * (c_learn * jnp.sqrt(n_parent))[:, None] / (1.0 + nf)
        util_inner = q + u
        if tp_params is not None and is_root is not None:
            feats = TP.edge_features(
                n_parent, parent_wdl, nf, prior, qw_e, qd_e
            )
            logits = TP.apply(tp_params, feats)
            temp = jnp.maximum(
                cfg.exploration_constant
                + cfg.exploration_scaling
                * jnp.log10(jnp.maximum(n_parent, 1.0))[:, None],
                1e-3,
            )
            rnd = _hash_uniform(
                node[:, None] + jnp.zeros_like(visits),
                jnp.arange(visits.shape[-1], dtype=jnp.int32)[None, :]
                + jnp.zeros_like(visits),
                n_parent.astype(jnp.int32)[:, None] + jnp.zeros_like(visits),
            )
            gumbel = -jnp.log(-jnp.log(jnp.clip(rnd, 1e-7, 1.0 - 1e-7)))
            util_root = logits / temp + gumbel
            util = jnp.where(is_root[:, None], util_root, util_inner)
        else:
            util = util_inner
    else:  # puct family
        u = prior * (c_puct * jnp.sqrt(n_parent))[:, None] / (1.0 + nf)
        util = q + u

    # proven edges pin the utility (reference: EdgeSelector.cpp:400-410)
    dist = S.get_distance(escore).astype(jnp.float32)
    util = jnp.where(S.is_win(escore), 1000.0 - dist, util)
    util = jnp.where(S.is_loss(escore), -1000.0 + dist, util)
    util = jnp.where(S.is_draw(escore) & S.is_finite(escore), 0.5, util)
    return jnp.where(valid, util, -jnp.inf)


def select_edge(
    tree: Tree,
    cfg: MCTSConfig,
    node: jax.Array,
    prior: jax.Array,
    vl: jax.Array | None = None,
    is_root: jax.Array | None = None,
    tp_params: Any = None,
    packed: jax.Array | None = None,
) -> jax.Array:
    """Best edge slot [B] of `node` [B] by the configured in-tree policy."""
    return jnp.argmax(
        _edge_utility(tree, cfg, node, prior, vl, is_root, tp_params, packed),
        axis=-1,
    ).astype(jnp.int32)


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
    net_apply: Callable,
    variables: Any,
    tables: V.RuleTables,
    board,
    stm,
    raw_input: bool,
    sym_modes: jax.Array | None = None,
):
    """NN forward on [B,H,W] boards: returns (policy [B,H,W] masked probs,
    value (win,draw) [B,2], q_expect [B,H,W], moves_left [B], legal mask).

    `sym_modes` [B] applies a per-sample board symmetry before the network
    and the inverse to the spatial outputs — random per-evaluation symmetry
    averaging (reference: NNEvaluator random augmentation + inverse unpack,
    NNEvaluator.cpp:134-141,263-286)."""
    from ..utils import augment as AUG

    packed = F.encode(tables, board, stm)
    if sym_modes is not None:
        packed_in = F.augment_features_batch(packed, sym_modes)
    else:
        packed_in = packed
    planes = F.unpack_raw_planes(packed_in) if raw_input else F.unpack_planes(packed_in)
    out = net_apply(variables, planes)
    if sym_modes is not None:
        out = out._replace(
            policy_logits=AUG.inverse_symmetry_batch(out.policy_logits, sym_modes),
            q_logits=(
                AUG.inverse_symmetry_batch(
                    jnp.moveaxis(out.q_logits, -1, 1), sym_modes
                ).transpose(0, 2, 3, 1)
                if out.q_logits is not None
                else None
            ),
        )
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


class SearchStats(NamedTuple):
    """On-device per-phase counters accumulated by every simulate step,
    the lockstep counterpart of the reference's SearchStats / TimedStat
    discipline (reference: monte_carlo/Search.hpp:33-54 select/expand/
    backup timers + nb_duplicate_nodes/nb_information_leaks counters,
    NodeCacheStats NodeCache.hpp:22-49).  All [B] int32, per tree."""

    depth_sum: jax.Array  # total descent plies
    expansions: jax.Array  # new nodes allocated
    transpositions: jax.Array  # hash-probe hits linked to existing nodes
    duplicates: jax.Array  # same-edge duplicate selections within a batch
    proven_revisits: jax.Array  # descents ending at a proven node
    terminals: jax.Array  # leaves that were terminal positions
    solver_wins: jax.Array  # leaf-solver proven wins
    solver_losses: jax.Array  # loss-prover proven losses

    @staticmethod
    def zeros(batch: int) -> "SearchStats":
        z = jnp.zeros(batch, jnp.int32)
        return SearchStats(z, z, z, z, z, z, z, z)

    def summary(self, sims: jax.Array) -> dict:
        """Host-side aggregate dict (printable after a search)."""
        import numpy as np

        s = float(np.maximum(np.asarray(sims, np.float64).sum(), 1.0))
        f = lambda x: float(np.asarray(x, np.float64).sum())
        return {
            "avg_depth": f(self.depth_sum) / s,
            "expansions": f(self.expansions),
            "transpositions": f(self.transpositions),
            "duplicates": f(self.duplicates),
            "proven_revisits": f(self.proven_revisits),
            "terminals": f(self.terminals),
            "solver_wins": f(self.solver_wins),
            "solver_losses": f(self.solver_losses),
        }


class SearchState(NamedTuple):
    """Carry of the per-move search: tree + root position.

    `root_node` is a per-board node index, enabling between-move subtree
    reuse: after a move the engine can point the root at the played child
    and keep the accumulated statistics (reference: Tree::setBoard +
    NodeCache::cleanup subtree carry-over, Tree.cpp:128-151)."""

    tree: Tree
    root_board: jax.Array  # [B, H, W] int8
    root_stm: jax.Array  # [B] int8 side to move at root
    root_node: jax.Array  # [B] int32 index of the root node
    noisy_prior: jax.Array  # [B, K] root priors with exploration noise
    sims_done: jax.Array  # [B] int32
    stats: SearchStats  # per-phase counters (reference: Search.hpp:33-54)


def make_simulate_fn(
    net_apply: Callable,
    tables: V.RuleTables,
    cfg: MCTSConfig,
    raw_input: bool = True,
    profile_cutoff: str | None = None,
    tp_params: Any = None,
    nnue: Any = None,
    nnue_weight: float = 0.5,
):
    """Build the jittable one-step simulation batch: (variables, state) ->
    state, advancing every tree by `cfg.leaf_batch` simulations.

    Per step: S sequential PUCT descents under virtual loss (the in-flight
    leaf batch of the reference's SearchTaskList, Search.hpp:56-96), ONE
    fused NN evaluation over all S x B reached positions, a deduplicated
    batch expansion, and backup of all paths (visit/value statistics in one
    one-hot einsum over the concatenated paths; the sequential proven-score
    minimax runs per sub-simulation so later proofs see earlier ones).

    profile_cutoff in {"select", "evaluate", "expand"} truncates the step
    after that phase (dev-only, for attributing step cost on hardware)."""

    D = cfg.max_depth
    K = cfg.max_edges
    NSIM = max(1, cfg.leaf_batch)
    needs_q_init = cfg.init_to == "q_head" or cfg.policy in (
        "puct_variance", "learnable"
    )

    class _Sub(NamedTuple):
        leaf: jax.Array  # [B]
        sim_board: jax.Array  # [B, H, W]
        leaf_stm: jax.Array  # [B]
        steps: jax.Array  # [B]
        need_expand: jax.Array  # [B]
        last_r: jax.Array
        last_c: jax.Array
        pn_t: jax.Array  # [B, D]
        ps_t: jax.Array  # [B, D]
        last_node: jax.Array
        last_slot: jax.Array

    def simulate(variables: Any, state: SearchState) -> SearchState:
        tree = state.tree
        bsz = tree.batch
        h, w = state.root_board.shape[1], state.root_board.shape[2]
        b = jnp.arange(bsz)
        n_iota = jnp.arange(tree.capacity, dtype=jnp.int32)[None, :]  # [1, N]
        k_iota = jnp.arange(K, dtype=jnp.int32)
        # node statistics snapshot for the descents (the tree is frozen
        # during select): one fused [B, N, 3] pack → one gather per
        # descent iteration instead of two
        packed_stats = pack_node_stats(tree)

        # ------------------------------------------------------------------
        # SELECT: S descents, each seeing the previous paths as virtual loss
        # (reference: Tree::select + SearchTaskList batching,
        # Tree.cpp:226-251, Search.cpp:117-158)
        # ------------------------------------------------------------------
        def one_descent(prev_nodes, prev_slots) -> _Sub:
            P = prev_nodes.shape[1]

            def body(carry):
                (cur, boardc, stm, steps, done, need_expand, move_r, move_c,
                 pn, ps, d) = carry
                prior = jnp.where(
                    (cur == state.root_node)[:, None], state.noisy_prior,
                    tree.edge_prior[b, cur].astype(jnp.float32),
                )
                if P:
                    match = prev_nodes == cur[:, None]  # [B, P]
                    vl = (
                        (prev_slots[:, :, None] == k_iota[None, None, :])
                        & match[:, :, None]
                    ).sum(1)
                else:
                    vl = None
                slot = select_edge(
                    tree, cfg, cur, prior, vl,
                    is_root=(cur == state.root_node), tp_params=tp_params,
                    packed=packed_stats,
                )
                action = tree.edge_action[b, cur, slot]
                child = tree.edge_child[b, cur, slot]
                no_edges = tree.edge_action[b, cur, 0] == NULL
                proven = S.is_proven(tree.node_score[b, cur])
                stop_here = done | no_edges | proven

                take = ~stop_here
                act32 = jnp.where(take, action, 0).astype(jnp.int32)
                r = jnp.clip(act32 // w, 0, h - 1)
                c = jnp.clip(act32 % w, 0, w - 1)
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
                hit_unexpanded = take & (child == NULL)
                now_done = stop_here | hit_unexpanded
                new_cur = jnp.where(
                    take & ~hit_unexpanded, child.astype(jnp.int32), cur
                )
                new_steps = steps + take.astype(jnp.int32)
                new_need = need_expand | hit_unexpanded
                pn = pn.at[d].set(jnp.where(take, cur, NULL))
                ps = ps.at[d].set(jnp.where(take, slot, NULL))
                return (
                    new_cur, boardc, new_stm, new_steps, now_done, new_need,
                    move_r, move_c, pn, ps, d + 1,
                )

            init = (
                state.root_node,
                state.root_board,
                state.root_stm,
                jnp.zeros(bsz, jnp.int32),
                jnp.zeros(bsz, bool),
                jnp.zeros(bsz, bool),
                jnp.zeros(bsz, jnp.int32),
                jnp.zeros(bsz, jnp.int32),
                jnp.full((D, bsz), NULL),
                jnp.full((D, bsz), NULL),
                jnp.zeros((), jnp.int32),
            )
            # early-exit: most descents are far shorter than max_depth, and
            # each iteration is latency-bound gather work
            out = jax.lax.while_loop(
                lambda c: (c[-1] < D) & jnp.any(~c[4]), body, init
            )
            (leaf, sim_board, leaf_stm, steps, _, need_expand, last_r, last_c,
             pn, ps, _) = out
            pn_t, ps_t = pn.T, ps.T
            last_i = jnp.clip(steps - 1, 0, D - 1)
            # mask-reduce pick along D (per-row gathers serialize on TPU)
            lhit = jnp.arange(D, dtype=jnp.int32)[None, :] == last_i[:, None]
            last_node = jnp.where(
                steps > 0, jnp.where(lhit, pn_t, 0).sum(-1), NULL
            )
            last_slot = jnp.where(
                steps > 0, jnp.where(lhit, ps_t, 0).sum(-1), 0
            )
            return _Sub(
                leaf, sim_board, leaf_stm, steps, need_expand, last_r, last_c,
                pn_t, ps_t, last_node, last_slot,
            )

        subs: list = []
        prev_nodes = jnp.full((bsz, 0), NULL)
        prev_slots = jnp.full((bsz, 0), NULL)
        for s in range(NSIM):
            sub = one_descent(prev_nodes, prev_slots)
            subs.append(sub)
            if s + 1 < NSIM:
                prev_nodes = jnp.concatenate([prev_nodes, sub.pn_t], 1)
                prev_slots = jnp.concatenate([prev_slots, sub.ps_t], 1)

        if profile_cutoff == "select":
            # the data dependency must flow into a REAL output leaf, or XLA
            # dead-code-eliminates the whole phase (x*0 folds to 0)
            dep = sum(
                s.steps + s.leaf + s.last_node + s.sim_board.sum((1, 2)).astype(jnp.int32)
                for s in subs
            )
            return state._replace(
                sims_done=state.sims_done + NSIM,
                stats=state.stats._replace(depth_sum=state.stats.depth_sum + dep),
            )

        # ------------------------------------------------------------------
        # TERMINAL CHECK + EVALUATE: all S x B positions in one fused batch
        # ------------------------------------------------------------------
        boards_f = jnp.concatenate([s.sim_board for s in subs], 0)  # [S*B,H,W]
        stm_f = jnp.concatenate([s.leaf_stm for s in subs], 0)
        lr_f = jnp.concatenate([s.last_r for s in subs], 0)
        lc_f = jnp.concatenate([s.last_c for s in subs], 0)
        need_f = jnp.concatenate([s.need_expand for s in subs], 0)

        mover = jnp.where(stm_f == CROSS, CIRCLE, CROSS).astype(jnp.int8)
        stones = (boards_f != V.NONE).sum((1, 2)).astype(jnp.int32)
        draw_after = cfg.draw_after if cfg.draw_after > 0 else h * w
        dtd_f = draw_after - stones  # [S*B] distance to the draw horizon
        outcome = V.outcome_after(
            tables, boards_f, lr_f, lc_f, mover, stones, draw_after
        )
        outcome = jnp.where(need_f, outcome, jnp.int8(int(GameOutcome.UNKNOWN)))
        terminal_f = outcome != jnp.int8(int(GameOutcome.UNKNOWN))
        term_score_f = S.from_outcome(outcome, stm_f)  # leaf's own view

        if cfg.symmetry_averaging:
            # deterministic pseudo-random per-evaluation symmetry: varies by
            # step counter, sub-simulation, and reached cell
            nsym = 8 if h == w else 4
            ctr = jnp.concatenate(
                [state.sims_done + 17 * s for s in range(NSIM)], 0
            )
            sym_f = (lr_f * 3 + lc_f * 5 + ctr) % nsym
        else:
            sym_f = None
        policy_f, value_f, q_expect_f, moves_left_f, legal_f, packed_f = _evaluate(
            net_apply, variables, tables, boards_f, stm_f, raw_input, sym_f
        )
        if nnue is not None:
            # blend the quantized NNUE evaluation into leaf values
            # (reference: the optional NNUE evaluation hooks inside the
            # solver, AlphaBetaSearch.hpp:57,62 — shipped off by default)
            from ..models import nnue as _nnue

            v_nnue = _nnue.evaluate_features(
                nnue, _nnue.nnue_features(tables, boards_f, stm_f)
            )
            value_f = (1.0 - nnue_weight) * value_f + nnue_weight * v_nnue
        value_f = jnp.where(
            terminal_f[:, None], S.convert_to_value(term_score_f), value_f
        )
        analysis_f = static_solver.analyze(packed_f, legal_f, dtd_f)

        # --------------------------------------------------------------
        # SOLVE: budgeted proof search on the leaf batch (reference: the
        # alpha-beta leg run on every SearchTaskList batch with a time
        # budget, Search.cpp:159-183).  A proven win overrides the static
        # node score, scores the winning edge, and boosts its prior so
        # expansion keeps it (UnifiedGenerator solver-edge precedence).
        # --------------------------------------------------------------
        solver_win_f = jnp.zeros(boards_f.shape[0], bool)
        if cfg.leaf_solver != "none":
            flat = boards_f.shape[0]
            cap = int(cfg.leaf_solver_cap)
            if cap and cap < flat:
                # compact the leaves that have ANY attacker threat cell
                # (own pattern-group bits of the already-encoded features):
                # quiet leaves have no root candidates and fail at solver
                # step 1, so they only waste lockstep width
                own_bits = (packed_f >> jnp.uint32(8)) & jnp.uint32(0xFFF)
                interest = (own_bits != 0).any((1, 2)) & need_f & ~terminal_f
                sel_idx = jax.lax.top_k(interest.astype(jnp.int32), cap)[1]
                onehot_sel = (
                    sel_idx[:, None]
                    == jnp.arange(flat, dtype=jnp.int32)[None, :]
                )  # [cap, flat]
                oh_bf = onehot_sel.astype(jnp.bfloat16)
                sub_board = jnp.round(jnp.einsum(
                    "kf,fx->kx", oh_bf,
                    boards_f.reshape(flat, -1).astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )).astype(jnp.int8).reshape((cap,) + boards_f.shape[1:])
                sub_stm = jnp.round(jnp.einsum(
                    "kf,f->k", oh_bf, stm_f.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )).astype(jnp.int8)
                solve_board, solve_stm = sub_board, sub_stm
            else:
                cap = 0
                solve_board, solve_stm = boards_f, stm_f
            fuse_loss = cfg.loss_prover and cfg.leaf_solver == "vct"
            if fuse_loss:
                # LOSS proving (reference: the fail-low leg of the per-leaf
                # alpha-beta over complete defensive move lists,
                # AlphaBetaSearch.cpp:91-135): candidates are leaves where
                # the OPPONENT of the side to move holds standing threats
                # (opp five / open-four / double-four bits of the encoded
                # features).  The prepared defender-option children are
                # CONCATENATED into the win solver's lockstep batch so both
                # legs ride one solve machine.
                from . import vct_batched as _vctb

                lcap = max(1, min(int(cfg.loss_cap), flat))
                opp_bits = (packed_f >> jnp.uint32(20)) & jnp.uint32(0xFFF)
                opp_threat = (opp_bits & jnp.uint32(0b111 << 8)) != 0
                cand_l = (
                    opp_threat.any((1, 2)) & need_f & ~terminal_f
                )
                sel_l = jax.lax.top_k(cand_l.astype(jnp.int32), lcap)[1]
                oh_l = (
                    sel_l[:, None]
                    == jnp.arange(flat, dtype=jnp.int32)[None, :]
                )  # [lcap, flat]
                ohl_bf = oh_l.astype(jnp.bfloat16)
                lb_board = jnp.round(jnp.einsum(
                    "kf,fx->kx", ohl_bf,
                    boards_f.reshape(flat, -1).astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )).astype(jnp.int8).reshape((lcap,) + boards_f.shape[1:])
                lb_stm = jnp.round(jnp.einsum(
                    "kf,f->k", ohl_bf, stm_f.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )).astype(jnp.int8)
                prep = _vctb.prepare_loss(
                    tables, lb_board, lb_stm, cfg.loss_options
                )
                n_win_rows = solve_board.shape[0]
                solve_board = jnp.concatenate(
                    [solve_board, prep.child_board], 0
                )
                solve_stm = jnp.concatenate([solve_stm, prep.child_stm], 0)
            if cfg.leaf_solver == "vcf":
                from . import vcf as _vcf

                sres = _vcf.solve(
                    tables, solve_board, solve_stm,
                    max_depth=cfg.leaf_solver_depth,
                    max_steps=cfg.leaf_solver_steps,
                )
            else:
                from . import vct_batched as _vctb

                sres = _vctb.solve(
                    tables, solve_board, solve_stm,
                    max_depth=cfg.leaf_solver_depth,
                    max_steps=cfg.leaf_solver_steps,
                    max_threes=cfg.leaf_solver_threes,
                )
            if fuse_loss:
                M = int(cfg.loss_options)
                cwin = sres.win[n_win_rows:].reshape(lcap, M)
                cdist = sres.distance[n_win_rows:].reshape(lcap, M)
                lres = _vctb.finish_loss(prep, cwin, cdist)
                sres = type(sres)(
                    win=sres.win[:n_win_rows],
                    best_move=sres.best_move[:n_win_rows],
                    distance=sres.distance[:n_win_rows],
                )
            if cap:
                # scatter the compacted proofs back to the flat leaf batch
                eq = onehot_sel  # [cap, flat]
                win_full = (eq & sres.win[:, None]).any(0)
                best_full = jnp.where(
                    win_full,
                    (eq * sres.best_move[:, None]).sum(0).astype(jnp.int32),
                    -1,
                )
                dist_full = (eq * sres.distance[:, None]).sum(0).astype(
                    jnp.int32
                )
                sres = sres._replace(
                    win=win_full, best_move=best_full, distance=dist_full
                )
            # a mate longer than the draw horizon is a draw, not a win
            swin = sres.win & need_f & ~terminal_f & (sres.distance <= dtd_f)
            solver_win_f = swin
            win_sc = S.win_in(jnp.clip(sres.distance, 1, 512))  # [S*B] u16
            onehot_best = (
                sres.best_move[:, None]
                == jnp.arange(h * w, dtype=jnp.int32)[None, :]
            ) & swin[:, None]
            asf = analysis_f.action_scores.reshape(-1, h * w)
            # win scores pack above every unproven code and shorter mates
            # pack higher, so maximum keeps the strongest claim
            asf = jnp.where(
                onehot_best, jnp.maximum(asf, win_sc[:, None]), asf
            )
            analysis_f = analysis_f._replace(
                action_scores=asf.reshape(analysis_f.action_scores.shape),
                node_score=jnp.where(
                    swin,
                    jnp.maximum(analysis_f.node_score, win_sc),
                    analysis_f.node_score,
                ),
            )
            policy_f = jnp.where(
                onehot_best.reshape(policy_f.shape), policy_f + 1.0, policy_f
            )

        solver_loss_f = jnp.zeros(boards_f.shape[0], bool)
        if cfg.leaf_solver != "none" and cfg.loss_prover and cfg.leaf_solver == "vct":
            # scatter the fused loss proofs back to the flat leaf batch; a
            # direct win proof (if both fired) takes precedence
            row_valid = (oh_l & cand_l[None, :]).any(-1)  # [lcap]
            lost_rows = lres.loss & row_valid
            dist_full = (
                oh_l * jnp.where(lost_rows, lres.distance, 0)[:, None]
            ).sum(0)
            lost_full = (
                (oh_l & lost_rows[:, None]).any(0)
                & ~solver_win_f
                & (dist_full <= dtd_f)  # mates past the horizon are draws
            )
            loss_sc = S.loss_in(jnp.clip(dist_full, 1, 512))
            solver_loss_f = lost_full
            analysis_f = analysis_f._replace(
                node_score=jnp.where(
                    lost_full, loss_sc, analysis_f.node_score
                ),
            )

        if profile_cutoff == "evaluate":
            dep = (
                value_f.sum(-1).reshape(NSIM, bsz).sum(0)
                + policy_f.reshape(NSIM, bsz, -1).sum((0, 2))
                + analysis_f.node_score.astype(jnp.float32).reshape(NSIM, bsz).sum(0)
            )
            return state._replace(
                sims_done=state.sims_done + NSIM,
                stats=state.stats._replace(
                    depth_sum=state.stats.depth_sum + dep.astype(jnp.int32)
                ),
            )

        # ------------------------------------------------------------------
        # EXPAND: allocate up to S new nodes per tree, deduplicated on the
        # target edge (reference: Tree::expand + duplicate-expansion
        # handling, Tree.cpp:257-298)
        # ------------------------------------------------------------------
        # transposition probe keys (reference: NodeCache::seek by full
        # zobrist hash + exact verification, NodeCache.hpp:51-120; here the
        # 64-bit key IS the identity — collision odds are negligible at
        # tree sizes of ~1e3 nodes)
        ztable = zobrist.make_table(h, w)
        hash_f = zobrist.full_hash(ztable, boards_f, stm_f)  # [S*B, 2]
        in_use = n_iota < tree.node_count[:, None]  # pre-step nodes only

        # -- edge generation for ALL subs in one flat [S*B] pass ------------
        actions_f, priors_f, complete_f = _topk_edges(
            policy_f, analysis_f.restrict, K, cfg.policy_expansion_temperature
        )
        actions_f = jnp.where((~terminal_f)[:, None], actions_f, NULL)
        safe_f = jnp.clip(actions_f, 0, h * w - 1)
        if needs_q_init:
            qv_f = q_expect_f.reshape(-1, h * w)
            q_init_f = jnp.where(
                actions_f != NULL, jnp.take_along_axis(qv_f, safe_f, -1), 0.0
            )
        else:
            q_init_f = jnp.zeros(actions_f.shape, jnp.float32)
        # one-hot byte-split dot instead of a per-row gather (row gathers run
        # ~10x slower than this tiny contraction on the v5e)
        oh_act = (
            safe_f[:, :, None]
            == jnp.arange(h * w, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.bfloat16)  # [S*B, K, HW]
        as32 = analysis_f.action_scores.reshape(-1, h * w).astype(jnp.int32)
        es_hi = jnp.einsum(
            "bka,ba->bk", oh_act, ((as32 >> 8) & 0xFF).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        es_lo = jnp.einsum(
            "bka,ba->bk", oh_act, (as32 & 0xFF).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        escore0_f = jnp.round(es_hi * 256.0 + es_lo).astype(jnp.int32)
        last_cell_f = ((boards_f == V.NONE).sum((1, 2)) <= 1)[:, None]
        escore0_f = jnp.where(
            last_cell_f & ~S.is_proven(escore0_f), S.draw_in(1), escore0_f
        )
        escore0_f = jnp.where(actions_f != NULL, escore0_f, S.zero()).astype(
            jnp.uint16
        )
        best_edge_f = jnp.max(
            jnp.where(actions_f != NULL, escore0_f, jnp.asarray(S.MINUS_INF)), -1
        ).astype(jnp.uint16)
        node_score_new_f = jnp.where(
            terminal_f,
            term_score_f,
            jnp.where(S.is_win(best_edge_f), best_edge_f, analysis_f.node_score),
        ).astype(jnp.uint16)

        def to_bs(x_f):
            """[S*B, ...] (sub-major) -> [B, S, ...]"""
            return x_f.reshape((NSIM, bsz) + x_f.shape[1:]).swapaxes(0, 1)

        actions_bs = to_bs(actions_f)  # [B, S, K]
        priors_bs = to_bs(priors_f)
        q_init_bs = to_bs(q_init_f)
        escore0_bs = to_bs(escore0_f)
        complete_bs = to_bs(complete_f)
        nsn_bs = to_bs(node_score_new_f)  # [B, S]
        term_bs = to_bs(terminal_f)
        tsc_bs = to_bs(term_score_f)
        hash_bs = to_bs(hash_f)  # [B, S, 2]
        ml_bs = to_bs(moves_left_f)
        value_bs = to_bs(value_f)  # [B, S, 2]

        need_bs = jnp.stack([sub.need_expand for sub in subs], 1)  # [B, S]
        steps_bs = jnp.stack([sub.steps for sub in subs], 1)
        leaf_bs = jnp.stack([sub.leaf for sub in subs], 1)
        last_node_bs = jnp.stack([sub.last_node for sub in subs], 1)
        last_slot_bs = jnp.stack([sub.last_slot for sub in subs], 1)

        # -- backup seeds: proven revisits (vectorized over [B, S]) ---------
        oh_leaf = (n_iota[:, None, :] == leaf_bs[..., None]).astype(
            jnp.bfloat16
        )  # [B, S, N]
        f32p = dict(preferred_element_type=jnp.float32)

        def byte_read_bs(arr_u16_bn, oh):
            """[B, N] u16 + [B, S, N] one-hot -> [B, S] u16 (exact)."""
            a32 = arr_u16_bn.astype(jnp.int32)
            hi = ((a32 >> 8) & 0xFF).astype(jnp.bfloat16)
            lo = (a32 & 0xFF).astype(jnp.bfloat16)
            out = jnp.einsum("bsn,bn->bs", oh, hi, **f32p) * 256.0 + jnp.einsum(
                "bsn,bn->bs", oh, lo, **f32p
            )
            return jnp.round(out).astype(jnp.int32).astype(jnp.uint16)

        leaf_score_bs = byte_read_bs(tree.node_score, oh_leaf)
        revisit_bs = (~need_bs) & S.is_proven(leaf_score_bs)
        start_value_bs = jnp.where(
            revisit_bs[..., None], S.convert_to_value(leaf_score_bs), value_bs
        )
        start_score_bs = jnp.where(
            need_bs, tsc_bs, jnp.where(revisit_bs, leaf_score_bs, S.zero())
        ).astype(jnp.uint16)
        start_ml_bs = ml_bs

        # -- dedup + transposition + allocation, closed form over [B, S] ----
        # (replaces the sequential per-sub chain: a sub that expands an edge
        # already claimed by an EARLIER sub links to that sub's node; hits in
        # the pre-step transposition table take the existing node.  A sub's
        # transposition verdict is independent of earlier subs: duplicates
        # share the position hash, so either the whole group hits the
        # pre-step table or none of it does.)
        if cfg.use_transpositions:
            hm = (
                tree.node_hash[:, None, :, :] == hash_bs[:, :, None, :]
            ).all(-1) & in_use[:, None, :]  # [B, S, N]
            found_bs = hm.any(-1) & need_bs & ~term_bs
            found_idx_bs = jnp.argmax(hm, -1).astype(jnp.int32)
            found_score_bs = byte_read_bs(
                tree.node_score, hm.astype(jnp.bfloat16)
            )
        else:
            found_bs = jnp.zeros((bsz, NSIM), bool)
            found_idx_bs = jnp.zeros((bsz, NSIM), jnp.int32)
            found_score_bs = jnp.zeros((bsz, NSIM), jnp.uint16)

        s_iota = jnp.arange(NSIM, dtype=jnp.int32)
        key_bs = last_node_bs * jnp.int32(K) + last_slot_bs  # [B, S]
        cand = need_bs & ~found_bs
        same_ss = key_bs[:, :, None] == key_bs[:, None, :]  # [B, S, S]
        earlier = (s_iota[None, :] < s_iota[:, None])[None]  # [1, S, S]
        first = cand & ~(same_ss & cand[:, None, :] & earlier).any(-1)
        # uniform lockstep allocation: sub s owns slot `start + s` in EVERY
        # tree (one scalar frontier), so all new-row writes become
        # dynamic-update-slice blocks instead of one-hot full-array passes
        # (measured ~1.5 ms/step of [B, N, K] where/einsum traffic at the
        # bench config).  Subs that do not expand (dedup / transposition /
        # terminal / proven revisit) leave their slot in the init state —
        # wasted capacity, never wrong.  node_count stays uniform across
        # the batch; lanes re-initialized by reuse_or_init_root simply skip
        # the [1, frontier) gap.
        frontier = jnp.max(tree.node_count)
        start = jnp.minimum(frontier, jnp.int32(tree.capacity - NSIM))
        slot_ids = start + s_iota  # [S]
        free_slot = slot_ids >= frontier  # False when clamped into old rows
        do_exp_bs = first & free_slot[None, :]
        new_idx_bs = jnp.broadcast_to(slot_ids[None, :], (bsz, NSIM))
        alloc = jnp.broadcast_to(jnp.maximum(frontier, start + NSIM), (bsz,))
        # duplicates: same edge as an expanded group-first
        first_exp = same_ss & do_exp_bs[:, None, :]  # [B, S, S']
        dup_bs = cand & ~first & first_exp.any(-1)
        dup_child_bs = (first_exp * new_idx_bs[:, None, :]).sum(-1)

        # refresh seeds with the new/transposed node's score
        start_score_bs = jnp.where(need_bs, nsn_bs, start_score_bs)
        start_value_bs = jnp.where(
            (need_bs & S.is_proven(nsn_bs))[..., None],
            S.convert_to_value(nsn_bs),
            start_value_bs,
        )
        start_score_bs = jnp.where(found_bs, found_score_bs, start_score_bs)
        start_value_bs = jnp.where(
            (found_bs & S.is_proven(found_score_bs))[..., None],
            S.convert_to_value(found_score_bs),
            start_value_bs,
        )

        link_flag_bs = do_exp_bs | found_bs
        link_target_bs = jnp.where(found_bs, found_idx_bs, new_idx_bs)
        touch_flag_bs = ((~need_bs) & (steps_bs > 0)) | found_bs | dup_bs
        touch_node_bs = jnp.where(
            found_bs, found_idx_bs, jnp.where(dup_bs, dup_child_bs, leaf_bs)
        )

        # -- edge-row writes of the new nodes --------------------------------
        # One dynamic-update-slice block per array at the shared frontier:
        # read-modify-write keeps non-expanding subs' slots exactly as they
        # were (init state, or live rows if the start got clamped at
        # capacity — those subs have do_exp False).
        import jax.lax as lax

        def rmw3(arr, blk_new):
            cur = lax.dynamic_slice(arr, (0, start, 0), (bsz, NSIM, K))
            blk = jnp.where(do_exp_bs[..., None], blk_new.astype(arr.dtype), cur)
            return lax.dynamic_update_slice(arr, blk, (0, start, 0))

        tree = tree._replace(
            edge_action=rmw3(tree.edge_action, actions_bs),
            edge_prior=rmw3(tree.edge_prior, priors_bs),
            edge_score=rmw3(tree.edge_score, escore0_bs),
        )
        if needs_q_init:
            tree = tree._replace(edge_q_init=rmw3(tree.edge_q_init, q_init_bs))
        tree = tree._replace(node_count=alloc)

        # -- node rows + parent links ----------------------------------------
        def rmw2(arr, blk_new):
            """[B, N(,C)] node arrays: one DUS block at the frontier."""
            starts = (0, start) + (0,) * (arr.ndim - 2)
            sizes = (bsz, NSIM) + arr.shape[2:]
            cur = lax.dynamic_slice(arr, starts, sizes)
            m = do_exp_bs.reshape(do_exp_bs.shape + (1,) * (arr.ndim - 2))
            blk = jnp.where(m, blk_new.astype(arr.dtype), cur)
            return lax.dynamic_update_slice(arr, blk, starts)

        tree = tree._replace(
            node_visits=rmw2(tree.node_visits, jnp.ones((bsz, NSIM), jnp.int32)),
            node_value_sum=rmw2(tree.node_value_sum, start_value_bs),
            node_score=rmw2(tree.node_score, nsn_bs),
            node_moves_left_sum=rmw2(tree.node_moves_left_sum, ml_bs),
            node_complete=rmw2(tree.node_complete, complete_bs & ~term_bs),
            node_hash=rmw2(tree.node_hash, hash_bs),
        )

        # parent links: one einsum placement for all subs (duplicate-found
        # links share the same target, keep only each edge's first linker)
        linkers = link_flag_bs & ~(
            same_ss & link_flag_bs[:, None, :] & earlier
        ).any(-1)
        if NSIM == 1:
            link_node = jnp.where(linkers[:, 0], last_node_bs[:, 0], NULL)
            link_mask = (n_iota == link_node[:, None])[:, :, None] & (
                k_iota[None, None, :] == last_slot_bs[:, 0][:, None, None]
            )
            tree = tree._replace(
                edge_child=jnp.where(
                    link_mask,
                    link_target_bs[:, 0].astype(jnp.int16)[:, None, None],
                    tree.edge_child,
                )
            )
        else:
            oh_ln = (
                (n_iota[:, None, :] == last_node_bs[..., None])
                & linkers[..., None]
            ).astype(jnp.bfloat16)  # [B, S, N]
            oh_lk = (
                k_iota[None, None, :] == last_slot_bs[..., None]
            ).astype(jnp.bfloat16)  # [B, S, K]
            tgt = link_target_bs.astype(jnp.int32)
            hi = ((tgt >> 8) & 0xFF).astype(jnp.bfloat16)
            lo = (tgt & 0xFF).astype(jnp.bfloat16)
            placed = jnp.einsum(
                "bsn,bsk,bs->bnk", oh_ln, oh_lk, hi, **f32p
            ) * 256.0 + jnp.einsum("bsn,bsk,bs->bnk", oh_ln, oh_lk, lo, **f32p)
            lmask = (
                jnp.einsum("bsn,bsk->bnk", oh_ln, oh_lk, **f32p) > 0.5
            )
            tree = tree._replace(
                edge_child=jnp.where(
                    lmask,
                    jnp.round(placed).astype(jnp.int32).astype(jnp.int16),
                    tree.edge_child,
                )
            )

        if profile_cutoff == "expand":
            # tree is a real output here, so the expand phase survives DCE
            return state._replace(tree=tree, sims_done=state.sims_done + NSIM)

        # -- stat credit for reached-but-not-created nodes -------------------
        # proven revisits, depth cutoffs, duplicate expansions, transposition
        # hits; exact one-hot einsum accumulation over all subs at once
        oh_touch = (
            (n_iota[:, None, :] == touch_node_bs[..., None])
            & touch_flag_bs[..., None]
        ).astype(jnp.bfloat16)  # [B, S, N]
        tree = tree._replace(
            node_visits=tree.node_visits
            + jnp.round(jnp.einsum("bsn->bn", oh_touch.astype(jnp.float32))).astype(
                jnp.int32
            ),
            node_value_sum=tree.node_value_sum
            + jnp.einsum("bsn,bsc->bnc", oh_touch, start_value_bs, **f32p),
            node_moves_left_sum=tree.node_moves_left_sum
            + jnp.einsum("bsn,bs->bn", oh_touch, start_ml_bs, **f32p),
        )

        if profile_cutoff == "credit":
            return state._replace(tree=tree, sims_done=state.sims_done + NSIM)

        # ------------------------------------------------------------------
        # BACKUP (reference: Tree::backup, Tree.cpp:299-351)
        #
        # Phase A: visit/value statistics of ALL paths in one one-hot einsum
        # (closed-form perspective flips; duplicates across sub-simulations
        # sum correctly).  Phase B: the proven-score minimax is sequential,
        # one small pass per sub-simulation so later proofs observe earlier
        # ones.
        # ------------------------------------------------------------------
        minus_inf = jnp.asarray(S.MINUS_INF)
        P = NSIM * D
        pn_sd = jnp.stack([s.pn_t for s in subs], 1)  # [B, S, D]
        ps_sd = jnp.stack([s.ps_t for s in subs], 1)
        nd_all = pn_sd.reshape(bsz, P)  # [B, P] (sub-major)
        sl_all = ps_sd.reshape(bsz, P)
        valid_all = nd_all != NULL
        nd_safe = jnp.where(valid_all, nd_all, 0)

        d_idx = jnp.arange(D, dtype=jnp.int32)[None, None, :]
        flips = steps_bs[..., None] - d_idx  # [B, S, D]
        odd = (flips & 1) == 1
        inv_value = S.value_invert(start_value_bs)  # [B, S, 2]
        val_all = jnp.where(
            odd[..., None], inv_value[:, :, None, :], start_value_bs[:, :, None, :]
        ).reshape(bsz, P, 2)
        ml_all = (start_ml_bs[..., None] + flips.astype(jnp.float32)).reshape(
            bsz, P
        )
        vsel_all = jnp.where(valid_all[..., None], val_all, 0.0)

        # edge statistics are derived from child nodes (see Tree docstring),
        # so path credit lands on [B, N] node arrays ONLY — the path nodes
        # are the parents, and the deepest edge's child got its credit at
        # creation / via the touch pass above
        onehot_nd = (
            (n_iota[:, None, :] == nd_safe[:, :, None]) & valid_all[..., None]
        ).astype(jnp.bfloat16)  # [B, P, N]; 0/1 exact in bf16, halves traffic
        delta_nvis = jnp.einsum(
            "bpn,bp->bn", onehot_nd, valid_all.astype(jnp.bfloat16), **f32p
        )
        delta_nval = jnp.einsum("bpn,bpc->bnc", onehot_nd, vsel_all, **f32p)
        delta_nml = jnp.einsum(
            "bpn,bp->bn", onehot_nd, jnp.where(valid_all, ml_all, 0.0), **f32p
        )
        tree = tree._replace(
            node_visits=tree.node_visits + jnp.round(delta_nvis).astype(jnp.int32),
            node_value_sum=tree.node_value_sum + delta_nval,
            node_moves_left_sum=tree.node_moves_left_sum + delta_nml,
        )

        if profile_cutoff == "backupA":
            return state._replace(tree=tree, sims_done=state.sims_done + NSIM)

        # Phase B: ALL sub-simulations in one vectorized pass.  Within each
        # sub the minimax walks its path sequentially (one merged scan over
        # depth with [B, S] lanes); across subs, claims to the same edge or
        # node are deduplicated by strength (Node::updateScore = max) — the
        # relaxation vs the reference's strictly sequential task processing
        # is that a sub's minimax reads the pre-backup tree, so a sibling
        # sub's brand-new proof propagates on the NEXT step instead of this
        # one (the same one-step delay batching already imposes on values).
        valid_sd = pn_sd != NULL  # [B, S, D]
        nd_sd = jnp.where(valid_sd, pn_sd, 0)
        sl_sd = jnp.where(valid_sd, ps_sd, 0)

        # one-hot einsum READS of all path rows (per-batch-row gathers
        # compile to serialized loop-fusions in this context — measured
        # 6.9 ms for the [B, P, K] score read vs ~0.1 ms for the einsum
        # form; bytes are exact in bf16; invalid rows read garbage that
        # the `vd` guards below never consume)
        def byte_read_p(arr_u16, per_slot: bool):
            a32 = arr_u16.astype(jnp.int32)
            hi = ((a32 >> 8) & 0xFF).astype(jnp.bfloat16)
            lo = (a32 & 0xFF).astype(jnp.bfloat16)
            eq = "bpn,bnk->bpk" if per_slot else "bpn,bn->bp"
            out = jnp.einsum(eq, onehot_nd, hi, **f32p) * 256.0 + jnp.einsum(
                eq, onehot_nd, lo, **f32p
            )
            return jnp.round(out).astype(jnp.int32).astype(jnp.uint16)

        es_rows = byte_read_p(tree.edge_score, True).reshape(bsz, NSIM, D, K)
        ea_rows = (
            jnp.einsum(
                "bpn,bnk->bpk", onehot_nd,
                (tree.edge_action != NULL).astype(jnp.bfloat16), **f32p
            )
            > 0.5
        ).reshape(bsz, NSIM, D, K)
        comp_rows = (
            jnp.einsum(
                "bpn,bn->bp", onehot_nd,
                tree.node_complete.astype(jnp.bfloat16), **f32p
            )
            > 0.5
        ).reshape(bsz, NSIM, D)
        ns_rows = byte_read_p(tree.node_score, False).reshape(bsz, NSIM, D)

        # backward minimax over all paths in ONE Pallas kernel (the lax.scan
        # form dispatches ~4 tiny kernels per level; ops/score_scan.py)
        from ..ops.score_scan import score_scan as _score_scan

        e_new_bp, ns_new_bp = _score_scan(
            start_score_bs.reshape(bsz * NSIM),
            valid_sd.reshape(bsz * NSIM, D),
            sl_sd.reshape(bsz * NSIM, D),
            es_rows.reshape(bsz * NSIM, D, K),
            ea_rows.reshape(bsz * NSIM, D, K),
            jnp.broadcast_to(comp_rows, (bsz, NSIM, D)).reshape(bsz * NSIM, D),
            ns_rows.reshape(bsz * NSIM, D),
        )
        e_new_p = e_new_bp.reshape(bsz, P)
        ns_new_p = ns_new_bp.reshape(bsz, P)
        e_old_p = (
            jnp.where(
                k_iota[None, None, :] == sl_all[..., None],
                es_rows.reshape(bsz, P, K),
                0,
            )
            .sum(-1)
            .astype(jnp.uint16)
        )
        ns_old_p = ns_rows.reshape(bsz, P)

        def dedup_claims(key_p, new_p, old_p):
            """Keep per (board, key) the strongest REAL claim: claims that
            change nothing lose to any changing claim, then higher packed
            score wins (Node::updateScore = max), then the earliest path
            position (reference: sequential task order)."""
            changes = (new_p != old_p) & valid_all
            rankv = new_p.astype(jnp.int32) + (changes.astype(jnp.int32) << 17)
            p_iota = jnp.arange(P, dtype=jnp.int32)
            same = (key_p[:, :, None] == key_p[:, None, :]) & valid_all[:, None, :]
            beats = (rankv[:, None, :] > rankv[:, :, None]) | (
                (rankv[:, None, :] == rankv[:, :, None])
                & (p_iota[None, None, :] < p_iota[None, :, None])
            )
            win = valid_all & ~(same & beats).any(-1)
            return jnp.where(
                win & changes,
                (new_p.astype(jnp.int32) - old_p.astype(jnp.int32)) & 0xFFFF,
                0,
            )

        ekey = nd_safe * jnp.int32(K) + jnp.where(valid_all, sl_all, 0)
        e_delta_p = dedup_claims(ekey, e_new_p, e_old_p)
        ns_delta_p = dedup_claims(nd_safe, ns_new_p, ns_old_p)

        def byte_place(delta_p, per_slot: bool):
            # bytes (0..255) are exact in bf16: fast MXU passes with f32
            # accumulation; winners are unique per (node, slot) so the
            # additive placement lands each delta exactly once
            hi = (delta_p >> 8).astype(jnp.bfloat16)
            lo = (delta_p & 0xFF).astype(jnp.bfloat16)
            if per_slot:
                zero = jnp.bfloat16(0)
                k_iota_row = k_iota[None, None, :]
                hi = jnp.where(k_iota_row == sl_all[..., None], hi[..., None], zero)
                lo = jnp.where(k_iota_row == sl_all[..., None], lo[..., None], zero)
                out = jnp.einsum("bpn,bpk->bnk", onehot_nd, hi, **f32p) * 256.0 + (
                    jnp.einsum("bpn,bpk->bnk", onehot_nd, lo, **f32p)
                )
            else:
                out = jnp.einsum("bpn,bp->bn", onehot_nd, hi, **f32p) * 256.0 + (
                    jnp.einsum("bpn,bp->bn", onehot_nd, lo, **f32p)
                )
            return jnp.round(out).astype(jnp.uint16)

        tree = tree._replace(
            edge_score=tree.edge_score + byte_place(e_delta_p, per_slot=True),
            node_score=tree.node_score + byte_place(ns_delta_p, per_slot=False),
        )

        # per-phase counters (reference: SearchStats, Search.hpp:33-54)
        st = state.stats
        sw = solver_win_f.reshape(NSIM, bsz).astype(jnp.int32).sum(0)
        sl = solver_loss_f.reshape(NSIM, bsz).astype(jnp.int32).sum(0)
        new_stats = SearchStats(
            depth_sum=st.depth_sum + steps_bs.sum(1),
            expansions=st.expansions + do_exp_bs.astype(jnp.int32).sum(1),
            transpositions=st.transpositions + found_bs.astype(jnp.int32).sum(1),
            duplicates=st.duplicates + dup_bs.astype(jnp.int32).sum(1),
            proven_revisits=st.proven_revisits
            + revisit_bs.astype(jnp.int32).sum(1),
            terminals=st.terminals
            + (term_bs & need_bs).astype(jnp.int32).sum(1),
            solver_wins=st.solver_wins + sw,
            solver_losses=st.solver_losses + sl,
        )

        return SearchState(
            tree=tree,
            root_board=state.root_board,
            root_stm=state.root_stm,
            root_node=state.root_node,
            noisy_prior=state.noisy_prior,
            sims_done=state.sims_done + NSIM,
            stats=new_stats,
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
    root_move_mask: jax.Array | None = None,
) -> SearchState:
    """Create fresh trees with the root (node 0) expanded, optionally with
    Dirichlet exploration noise on the root priors
    (reference: EdgeSelector.cpp applyDirichletNoise)."""
    bsz, h, w = board.shape
    tree = init_tree(bsz, cfg)
    policy, value, q_expect, moves_left, legal, packed = _evaluate(
        net_apply, variables, tables, board, stm, raw_input
    )
    draw_after = cfg.draw_after if cfg.draw_after > 0 else h * w
    dtd_root = draw_after - (board != V.NONE).sum((1, 2)).astype(jnp.int32)
    analysis = static_solver.analyze(packed, legal, dtd_root)
    if cfg.leaf_solver != "none":
        # solve the root position too — roots never appear as leaves, and a
        # root-proven win makes the proven edge dominate selection at once
        # (reference: AlphaBetaSearch also solves root tasks)
        if cfg.leaf_solver == "vcf":
            from . import vcf as _vcf

            sres = _vcf.solve(
                tables, board, stm,
                max_depth=cfg.leaf_solver_depth,
                max_steps=4 * cfg.leaf_solver_steps,
            )
        else:
            from . import vct_batched as _vctb

            sres = _vctb.solve(
                tables, board, stm,
                max_depth=cfg.leaf_solver_depth,
                max_steps=4 * cfg.leaf_solver_steps,
                max_threes=cfg.leaf_solver_threes,
            )
        sres = sres._replace(win=sres.win & (sres.distance <= dtd_root))
        win_sc = S.win_in(jnp.clip(sres.distance, 1, 512))
        onehot_best = (
            sres.best_move[:, None] == jnp.arange(h * w, dtype=jnp.int32)[None, :]
        ) & sres.win[:, None]
        asf = analysis.action_scores.reshape(bsz, h * w)
        asf = jnp.where(onehot_best, jnp.maximum(asf, win_sc[:, None]), asf)
        analysis = analysis._replace(
            action_scores=asf.reshape(analysis.action_scores.shape),
            node_score=jnp.where(
                sres.win,
                jnp.maximum(analysis.node_score, win_sc),
                analysis.node_score,
            ),
        )
        policy = jnp.where(
            onehot_best.reshape(policy.shape), policy + 1.0, policy
        )
        if cfg.loss_prover:
            # prove a lost ROOT over the COMPLETE defensive option set —
            # unlike the complete-node minimax this does not require all
            # legal moves to fit in the K edge slots (reference: the
            # fail-low alpha-beta leg, AlphaBetaSearch.cpp:91-135)
            from . import vct_batched as _vctb

            lcap = max(1, min(int(cfg.loss_cap), bsz))
            opp_bits = (packed >> jnp.uint32(20)) & jnp.uint32(0xFFF)
            cand_l = ((opp_bits & jnp.uint32(0b111 << 8)) != 0).any(
                (1, 2)
            ) & ~sres.win
            sel_l = jax.lax.top_k(cand_l.astype(jnp.int32), lcap)[1]
            oh_l = (
                sel_l[:, None] == jnp.arange(bsz, dtype=jnp.int32)[None, :]
            )
            ohl_bf = oh_l.astype(jnp.bfloat16)
            lb_board = jnp.round(jnp.einsum(
                "kf,fx->kx", ohl_bf,
                board.reshape(bsz, -1).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )).astype(jnp.int8).reshape((lcap, h, w))
            lb_stm = jnp.round(jnp.einsum(
                "kf,f->k", ohl_bf, stm.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )).astype(jnp.int8)
            lres = _vctb.solve_loss(
                tables, lb_board, lb_stm,
                max_options=cfg.loss_options,
                max_depth=cfg.leaf_solver_depth,
                max_steps=4 * cfg.leaf_solver_steps,
                max_threes=cfg.leaf_solver_threes,
            )
            lost_rows = lres.loss & (oh_l & cand_l[None, :]).any(-1)
            dist_full = (
                oh_l * jnp.where(lost_rows, lres.distance, 0)[:, None]
            ).sum(0)
            lost_full = (oh_l & lost_rows[:, None]).any(0) & (dist_full <= dtd_root)
            analysis = analysis._replace(
                node_score=jnp.where(
                    lost_full,
                    S.loss_in(jnp.clip(dist_full, 1, 512)),
                    analysis.node_score,
                ),
            )
    restrict = analysis.restrict
    if root_move_mask is not None:
        # opening generators restrict the root move set (reference:
        # Center/Symmetrical-excluding EdgeGenerators); never to empty
        masked = restrict & root_move_mask
        restrict = jnp.where(
            jnp.any(masked, (1, 2), keepdims=True), masked, restrict
        )
    actions, priors, complete = _topk_edges(
        policy, restrict, cfg.max_edges, cfg.policy_expansion_temperature
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
        edge_action=tree.edge_action.at[:, 0].set(actions.astype(jnp.int16)),
        edge_prior=tree.edge_prior.at[:, 0].set(priors.astype(jnp.bfloat16)),
        edge_score=tree.edge_score.at[:, 0].set(edge_scores0),
        edge_q_init=tree.edge_q_init.at[:, 0].set(q_init.astype(jnp.bfloat16)),
        node_hash=tree.node_hash.at[:, 0].set(
            zobrist.full_hash(zobrist.make_table(h, w), board, stm)
        ),
        node_count=jnp.ones(bsz, jnp.int32),
    )
    noisy = _apply_root_noise(cfg, priors, actions, noise_key)
    return SearchState(
        tree=tree,
        root_board=board,
        root_stm=stm,
        root_node=jnp.zeros(bsz, jnp.int32),
        noisy_prior=noisy,
        sims_done=jnp.zeros(bsz, jnp.int32),
        stats=SearchStats.zeros(bsz),
    )


def _apply_root_noise(
    cfg: MCTSConfig,
    priors: jax.Array,
    actions: jax.Array,
    noise_key: jax.Array | None,
) -> jax.Array:
    """Root exploration noise over the K edge priors, per cfg.noise_type
    (reference: applyDirichlet/Gumbel/CustomNoise, EdgeSelector.cpp:602-625)."""
    bsz = priors.shape[0]
    noisy = priors
    if noise_key is not None and cfg.noise_weight > 0.0:
        valid_e = actions != NULL
        if cfg.noise_type == "gumbel":
            # log-space perturbation, renormalized by softmax (reference:
            # applyGumbelNoise, EdgeSelector.cpp:616-624)
            g = jax.random.gumbel(noise_key, (bsz, cfg.max_edges))
            logits = jnp.log(jnp.maximum(priors, 1e-9)) + cfg.noise_weight * g
            noisy = jnp.where(valid_e, jax.nn.softmax(
                jnp.where(valid_e, logits, -jnp.inf), -1), 0.0)
        else:
            if cfg.noise_type == "custom":
                # stick-breaking noise: r_i = u_i^4 * (1 - sum so far), then
                # a random shuffle (reference: createCustomNoise,
                # src/utils/random.cpp:89-100)
                ku, kp = jax.random.split(noise_key)
                u4 = jax.random.uniform(ku, (bsz, cfg.max_edges)) ** 4
                rem = jnp.cumprod(1.0 - u4, axis=-1) / jnp.maximum(1.0 - u4, 1e-9)
                noise = u4 * rem
                perm_keys = jax.random.split(kp, bsz)
                noise = jax.vmap(jax.random.permutation)(perm_keys, noise)
            else:  # dirichlet (default)
                noise = jax.random.dirichlet(
                    noise_key, jnp.full((cfg.max_edges,), cfg.noise_alpha), (bsz,)
                )
            noisy = jnp.where(
                valid_e,
                (1.0 - cfg.noise_weight) * priors + cfg.noise_weight * noise,
                0.0,
            )
        noisy = noisy / jnp.maximum(noisy.sum(-1, keepdims=True), 1e-12)
    return noisy


def reuse_or_init_root(
    net_apply: Callable,
    variables: Any,
    tables: V.RuleTables,
    cfg: MCTSConfig,
    prev_state: SearchState,
    prev_move: jax.Array,
    board: jax.Array,
    stm: jax.Array,
    reserve: int,
    raw_input: bool = True,
    noise_key: jax.Array | None = None,
) -> SearchState:
    """Between-move subtree carry-over: point the root at the played child
    and keep the accumulated statistics, re-initializing only the lanes that
    cannot reuse (reference: Tree::setBoard + NodeCache::cleanup subtree
    carry-over, Tree.cpp:128-151, NodeCache.hpp cleanup).

    `prev_move` [B] is the flat action just played from `prev_state`'s root
    (-1 disables reuse for that lane).  `reserve` is the node budget the
    NEXT search needs — lanes whose tree cannot fit it restart fresh (the
    lockstep replacement for the reference's reachable-subtree compaction:
    capacity is recycled wholesale instead of per-node).

    Everything is jit-compatible; one fused NN evaluation covers the fresh
    lanes (its cost is one leaf batch, amortized over the whole search).
    """
    bsz = board.shape[0]
    b = jnp.arange(bsz)
    fresh = init_root(
        net_apply, variables, tables, cfg, board, stm, raw_input, noise_key
    )

    tree = prev_state.tree
    actions = tree.edge_action[b, prev_state.root_node].astype(jnp.int32)  # [B,K]
    hit = actions == prev_move[:, None]
    has_slot = hit.any(-1) & (prev_move >= 0)
    slot = jnp.argmax(hit, -1)
    child = tree.edge_child[b, prev_state.root_node, slot].astype(jnp.int32)
    fits = tree.node_count + jnp.int32(reserve) <= tree.capacity
    reuse = has_slot & (child != NULL) & fits
    child_safe = jnp.where(reuse, child, 0)

    def comb(carried, fresh_arr):
        m = reuse.reshape((bsz,) + (1,) * (carried.ndim - 1))
        return jnp.where(m, carried, fresh_arr)

    tree_c = Tree(*[comb(c, f) for c, f in zip(tree, fresh.tree)])
    root_node = jnp.where(reuse, child, fresh.root_node)

    child_actions = tree.edge_action[b, child_safe]
    child_prior = jnp.where(
        child_actions != NULL, tree.edge_prior[b, child_safe].astype(jnp.float32), 0.0
    )
    noisy_child = _apply_root_noise(cfg, child_prior, child_actions, noise_key)
    noisy = jnp.where(reuse[:, None], noisy_child, fresh.noisy_prior)

    return SearchState(
        tree=tree_c,
        root_board=board,
        root_stm=stm,
        root_node=root_node,
        noisy_prior=noisy,
        sims_done=jnp.zeros(bsz, jnp.int32),
        stats=SearchStats.zeros(bsz),
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
    root_move_mask: jax.Array | None = None,
    tp_params: Any = None,
    nnue: Any = None,
) -> SearchState:
    """Full search: init root + `num_simulations` batched simulations under
    one lax.scan (jit the caller; everything stays on device)."""
    state = init_root(
        net_apply, variables, tables, cfg, board, stm, raw_input, noise_key,
        root_move_mask,
    )
    # The freshly-initialized tree arrays are mostly broadcast constants;
    # without a barrier XLA SINKS them into the simulation loop and
    # re-applies `select(step==0, init, carry)` over every big edge array on
    # EVERY step (~2 ms/step of pure waste at the bench config).  The
    # barrier forces one materialization before the scan.
    state = jax.lax.optimization_barrier(state)
    simulate = make_simulate_fn(
        net_apply, tables, cfg, raw_input, tp_params=tp_params, nnue=nnue
    )

    def step(s, _):
        return simulate(variables, s), None

    steps = -(-num_simulations // max(1, cfg.leaf_batch))
    state, _ = jax.lax.scan(step, state, None, length=steps)
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
    rb = jnp.arange(bsz)
    visits = edge_stats(tree, rb, state.root_node).visits.astype(jnp.float32)
    actions = tree.edge_action[rb, state.root_node]
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
    rb = jnp.arange(tree.batch)
    n = jnp.maximum(
        tree.node_visits[rb, state.root_node].astype(jnp.float32), 1.0
    )
    return tree.node_value_sum[rb, state.root_node] / n[:, None]


def select_move(
    state: SearchState,
    key: jax.Array | None = None,
    temperature: float = 0.0,
) -> jax.Array:
    """Final move [B] (flat action index): the reference's BestEdge ordering,
    or visit-count sampling with temperature (reference: BestEdgeSelector /
    final selector sampling in GameGenerator.cpp:145-173).

    BestEdge op (EdgeSelector.cpp:515-536, exact):
      WIN  -> +1e8 - distance-to-mate
      LOSS -> -1e8 + distance-to-mate
      else -> visits + expectation * parent_visits + 0.001 * prior"""
    tree = state.tree
    rb = jnp.arange(tree.batch)
    es = edge_stats(tree, rb, state.root_node)
    visits = es.visits.astype(jnp.float32)
    actions = tree.edge_action[rb, state.root_node]
    escore = es.score
    valid = actions != NULL
    h, w = state.root_board.shape[1], state.root_board.shape[2]

    if key is not None and temperature > 0.0:
        logits = jnp.where(
            valid, jnp.log(jnp.maximum(visits, 1e-9)) / temperature, -jnp.inf
        )
        slot = jax.random.categorical(key, logits, axis=-1)
    else:
        q = es.q_win + 0.5 * es.q_draw
        parent_n = tree.node_visits[rb, state.root_node].astype(jnp.float32)
        prior = tree.edge_prior[rb, state.root_node].astype(jnp.float32)
        util = visits + q * parent_n[:, None] + 0.001 * prior
        dist = S.get_distance(escore).astype(jnp.float32)
        util = jnp.where(S.is_win(escore), 1e8 - dist, util)
        util = jnp.where(S.is_loss(escore), -1e8 + dist, util)
        util = jnp.where(valid, util, -jnp.inf)
        slot = jnp.argmax(util, axis=-1)
    b = jnp.arange(tree.batch)
    return jnp.clip(actions[b, slot], 0, h * w - 1)
