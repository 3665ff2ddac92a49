"""Lockstep batched self-play: thousands of games stepped together, MCTS +
env + sample recording all on device under one jitted scan.

TPU-native replacement for the reference's actor farm
(reference: src/selfplay/{GeneratorManager,GeneratorThread,GameGenerator}.cpp):
the per-game coroutine state machines multiplexed onto one NN evaluator
become a `[B]` batch of environments advanced in lockstep — the NN batch is
the game batch times one leaf per tree.

Sample layout mirrors `SearchDataPack` (reference: dataset/data_packs.cpp:
24-43): board, side to move, per-cell visit distribution, per-cell action
values (from root edges), root value, played move, and the final game
outcome backfilled after the scan.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..game.types import CROSS, CIRCLE, GameOutcome
from ..game import vectorized as V
from ..search import mcts
from ..search import score as S


class SelfplayConfig(NamedTuple):
    """(reference: utils/configs.hpp SelfplayConfig + GameConfig)"""

    num_simulations: int = 100
    temperature_moves: int = 10  # sample by visits for the first N plies
    temperature: float = 1.0
    noise_weight: float = 0.25
    noise_alpha: float = 0.1
    max_moves: int = 128  # scan length; longer games are truncated
    tree_reuse: bool = False  # carry the played child's subtree between
    # moves (reference: Tree::setBoard + NodeCache::cleanup carry-over,
    # Tree.cpp:128-151); needs mcfg.max_nodes headroom beyond one search
    draw_after: int = 0  # adjudicate a draw after this many stones
    # (reference: GameConfig::draw_after); 0 = board area


class GameRecord(NamedTuple):
    """One move's training sample, batched [M, B, ...] by the scan."""

    board: jax.Array  # [M, B, H, W] int8 (position BEFORE the move)
    stm: jax.Array  # [M, B] int8 side to move
    visit_dist: jax.Array  # [M, B, H, W] f32 root visit distribution
    q_value: jax.Array  # [M, B, H, W, 2] f32 root edge (win, draw)
    q_mask: jax.Array  # [M, B, H, W] bool visited-edge mask
    root_value: jax.Array  # [M, B, 2] f32
    move: jax.Array  # [M, B] int32 flat action
    alive: jax.Array  # [M, B] bool sample validity
    phase_counters: jax.Array  # [M, 8] f32: batch-summed per-move search
    # counters [depth_sum, expansions, transpositions, duplicates,
    # proven_revisits, terminals, solver_wins, sims] — the lockstep
    # counterpart of the reference's 60 s aggregated selfplay stats
    # (reference: GeneratorManager.cpp:219-239, Search.hpp:33-54)


class SelfplayResult(NamedTuple):
    record: GameRecord
    outcome: jax.Array  # [B] int8 final GameOutcome (UNKNOWN if truncated)
    game_length: jax.Array  # [B] int32 plies played


def _root_q(state: mcts.SearchState):
    """Per-cell root action values + mask from the K root edges."""
    tree = state.tree
    bsz = tree.batch
    h, w = state.root_board.shape[1], state.root_board.shape[2]
    rb = jnp.arange(bsz)
    actions = tree.edge_action[rb, state.root_node].astype(jnp.int32)
    es = mcts.edge_stats(tree, rb, state.root_node)
    visits = es.visits
    valid = (actions != mcts.NULL) & (visits > 0)
    q = jnp.stack([es.q_win, es.q_draw], axis=-1)
    b = jnp.arange(bsz)[:, None]
    idx = jnp.clip(actions, 0, h * w - 1)
    qmap = jnp.zeros((bsz, h * w, 2), jnp.float32)
    qmap = qmap.at[b, idx].add(jnp.where(valid[..., None], q, 0.0))
    mmap = jnp.zeros((bsz, h * w), bool)
    mmap = mmap.at[b, idx].max(valid)
    return qmap.reshape(bsz, h, w, 2), mmap.reshape(bsz, h, w)


class PlayCarry(NamedTuple):
    """Scan carry of lockstep selfplay: env + previous search (for tree
    reuse) + the move that produced the current position."""

    env: V.EnvState
    search: mcts.SearchState
    prev_move: jax.Array  # [B] int32, -1 before the first search


def init_carry(
    net_apply: Callable,
    variables: Any,
    tables: V.RuleTables,
    mcfg: mcts.MCTSConfig,
    batch: int,
    rows: int,
    cols: int,
    init_env: V.EnvState | None = None,
) -> PlayCarry:
    """Fresh carry; `init_env` seeds games from prepared openings
    (reference: GameGenerator PREPARE_OPENING, GameGenerator.cpp:60-75)."""
    env = init_env if init_env is not None else V.env_reset(batch, rows, cols)
    search = mcts.init_root(
        net_apply, variables, tables, mcfg, env.board, env.to_move
    )
    return PlayCarry(env, search, jnp.full(batch, -1, jnp.int32))


def make_move_step(
    net_apply: Callable,
    variables: Any,
    tables: V.RuleTables,
    mcfg: mcts.MCTSConfig,
    scfg: SelfplayConfig,
    cols: int,
):
    """One selfplay move for the whole batch: (carry, (move_idx, key)) ->
    (carry, GameRecord).  Scan-able; also the unit of chunked/resumable
    generation."""

    def move_step(carry: PlayCarry, inp):
        envc = carry.env
        move_idx, k = inp
        k_noise, k_sample = jax.random.split(k)

        if scfg.tree_reuse:
            state0 = mcts.reuse_or_init_root(
                net_apply, variables, tables, mcfg,
                carry.search, carry.prev_move, envc.board, envc.to_move,
                reserve=scfg.num_simulations + 8, noise_key=k_noise,
            )
            simulate = mcts.make_simulate_fn(net_apply, tables, mcfg)
            steps_n = -(-scfg.num_simulations // max(1, mcfg.leaf_batch))
            state = jax.lax.scan(
                lambda s, _: (simulate(variables, s), None),
                state0, None, length=steps_n,
            )[0]
        else:
            state = mcts.run_search(
                net_apply, variables, tables, mcfg,
                envc.board, envc.to_move, scfg.num_simulations,
                noise_key=k_noise,
            )
        dist = mcts.root_visit_distribution(state)
        rval = mcts.root_value(state)
        qmap, qmask = _root_q(state)

        # temperature sampling for opening diversity, argmax after
        # (reference: GameGenerator final selector + opening temperature)
        move_greedy = mcts.select_move(state)
        move_sampled = mcts.select_move(state, k_sample, scfg.temperature)
        move = jnp.where(move_idx < scfg.temperature_moves, move_sampled, move_greedy)

        alive = envc.outcome == jnp.int8(int(GameOutcome.UNKNOWN))
        st = state.stats
        counters = jnp.stack(
            [
                st.depth_sum.sum(), st.expansions.sum(),
                st.transpositions.sum(), st.duplicates.sum(),
                st.proven_revisits.sum(), st.terminals.sum(),
                st.solver_wins.sum(), state.sims_done.sum(),
            ]
        ).astype(jnp.float32)
        sample = GameRecord(
            board=envc.board,
            stm=envc.to_move,
            visit_dist=dist,
            q_value=qmap,
            q_mask=qmask,
            root_value=rval,
            move=move,
            alive=alive,
            phase_counters=counters,
        )
        newenv = V.env_step(
            tables, envc, move // cols, move % cols,
            draw_after=scfg.draw_after,
        )
        return PlayCarry(newenv, state, move.astype(jnp.int32)), sample

    return move_step


def play_games(
    net_apply: Callable,
    variables: Any,
    tables: V.RuleTables,
    mcfg: mcts.MCTSConfig,
    scfg: SelfplayConfig,
    key: jax.Array,
    batch: int,
    rows: int,
    cols: int,
    init_env: V.EnvState | None = None,
) -> SelfplayResult:
    """Play `batch` games in lockstep; jit the caller.

    Finished games freeze (env_step no-ops) and their samples are marked
    dead; the final outcome is backfilled into every sample of the game.
    `init_env` seeds games from prepared openings."""

    mcfg = mcfg._replace(
        noise_weight=scfg.noise_weight, noise_alpha=scfg.noise_alpha,
        draw_after=scfg.draw_after,
    )
    carry = init_carry(
        net_apply, variables, tables, mcfg, batch, rows, cols, init_env
    )
    move_step = make_move_step(net_apply, variables, tables, mcfg, scfg, cols)

    keys = jax.random.split(key, scfg.max_moves)
    steps = jnp.arange(scfg.max_moves)
    carry, record = jax.lax.scan(move_step, carry, (steps, keys))

    return SelfplayResult(
        record=record, outcome=carry.env.outcome, game_length=carry.env.move_count
    )


def play_games_resumable(
    net_apply: Callable,
    variables: Any,
    tables: V.RuleTables,
    mcfg: mcts.MCTSConfig,
    scfg: SelfplayConfig,
    key: jax.Array,
    batch: int,
    rows: int,
    cols: int,
    chunk_moves: int = 16,
    should_stop: Callable[[], bool] | None = None,
    snapshot_path: str | None = None,
    init_env: V.EnvState | None = None,
    on_stats: Callable[[dict], None] | None = None,
) -> SelfplayResult | None:
    """Chunked lockstep selfplay with mid-generation preemption snapshots.

    Plays `chunk_moves` plies per jitted call and checks `should_stop`
    between chunks; on stop, the full in-flight state (env, per-move record
    so far, chunk cursor, RNG key) is written to `snapshot_path` and None is
    returned.  A later call with the same arguments resumes from the
    snapshot and deletes it on completion (reference: the SIGINT mid-game
    serialization of every in-flight GameGenerator,
    GameGenerator.cpp:122-141, GeneratorManager.cpp:240-291).

    The search tree itself is NOT serialized — a resumed game re-searches
    its next move from scratch (with tree_reuse the carry rebuilds over the
    following moves), which matches the reference's resume semantics (it
    stores the game, not the tree)."""
    import os

    import numpy as np

    mcfg = mcfg._replace(
        noise_weight=scfg.noise_weight, noise_alpha=scfg.noise_alpha,
        draw_after=scfg.draw_after,
    )
    move_step = make_move_step(net_apply, variables, tables, mcfg, scfg, cols)

    @jax.jit
    def run_chunk(carry, steps, keys):
        return jax.lax.scan(move_step, carry, (steps, keys))

    n_chunks = -(-scfg.max_moves // chunk_moves)
    start_chunk = 0
    records: list = []
    carry = None
    if snapshot_path is not None and os.path.exists(snapshot_path):
        snap = np.load(snapshot_path, allow_pickle=False)
        start_chunk = int(snap["chunk"])
        key = jnp.asarray(snap["key"])
        env = V.EnvState(
            board=jnp.asarray(snap["board"]),
            to_move=jnp.asarray(snap["to_move"]),
            outcome=jnp.asarray(snap["outcome"]),
            move_count=jnp.asarray(snap["move_count"]),
        )
        carry = init_carry(
            net_apply, variables, tables, mcfg, batch, rows, cols, env
        )
        if start_chunk > 0:
            records = [
                GameRecord(
                    **{f: jnp.asarray(snap[f"rec_{f}"]) for f in GameRecord._fields}
                )
            ]
    if carry is None:
        carry = init_carry(
            net_apply, variables, tables, mcfg, batch, rows, cols, init_env
        )

    all_keys = jax.random.split(key, scfg.max_moves)
    for ci in range(start_chunk, n_chunks):
        lo = ci * chunk_moves
        hi = min(lo + chunk_moves, scfg.max_moves)
        steps = jnp.arange(lo, hi)
        carry, rec = run_chunk(carry, steps, all_keys[lo:hi])
        records.append(rec)
        if on_stats is not None:
            # aggregated per-phase counters of this chunk (reference: the
            # 60 s aggregated selfplay stats, GeneratorManager.cpp:219-239)
            c = np.asarray(rec.phase_counters).sum(0)
            sims = max(c[7], 1.0)
            on_stats(
                {
                    "moves": int(hi),
                    "games_live": int(
                        np.asarray(
                            carry.env.outcome == int(GameOutcome.UNKNOWN)
                        ).sum()
                    ),
                    "avg_depth": float(c[0] / sims),
                    "expansions": float(c[1]),
                    "transpositions": float(c[2]),
                    "duplicates": float(c[3]),
                    "proven_revisits": float(c[4]),
                    "terminals": float(c[5]),
                    "solver_wins": float(c[6]),
                    "sims": float(c[7]),
                }
            )
        if not bool(
            np.asarray(carry.env.outcome == int(GameOutcome.UNKNOWN)).any()
        ):
            # every game finished: later chunks would search frozen
            # positions (the reference's generators retire finished games
            # immediately, GameGenerator.cpp game-over handling)
            break
        if should_stop is not None and should_stop() and hi < scfg.max_moves:
            if snapshot_path is not None:
                rec_all = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs, 0), *records
                )
                payload = {
                    "chunk": np.asarray(ci + 1),
                    "key": np.asarray(key),
                    "board": np.asarray(carry.env.board),
                    "to_move": np.asarray(carry.env.to_move),
                    "outcome": np.asarray(carry.env.outcome),
                    "move_count": np.asarray(carry.env.move_count),
                }
                payload.update(
                    {f"rec_{f}": np.asarray(getattr(rec_all, f)) for f in GameRecord._fields}
                )
                tmp = snapshot_path + ".tmp.npz"
                np.savez_compressed(tmp, **payload)
                os.replace(tmp, snapshot_path)
            return None

    record = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, 0), *records)
    if snapshot_path is not None and os.path.exists(snapshot_path):
        os.remove(snapshot_path)
    return SelfplayResult(
        record=record, outcome=carry.env.outcome, game_length=carry.env.move_count
    )


def make_targets(result: SelfplayResult, moves_left_cap: int):
    """Flatten a SelfplayResult into per-sample training targets.

    Returns dict of [M*B, ...] arrays:
      planes_board/stm to re-encode features at train time (symmetry
      augmentation happens there, reference: SupervisedLearning.cpp:37-46),
      policy [.., H, W], value_wdl [.., 3], q targets + mask, moves_left
      bucket index, sample weight mask.
    """
    rec = result.record
    m, bsz = rec.stm.shape
    h, w = rec.board.shape[2], rec.board.shape[3]

    outcome = jnp.broadcast_to(result.outcome[None, :], (m, bsz))
    finished = outcome != jnp.int8(int(GameOutcome.UNKNOWN))
    valid = rec.alive & finished

    stm = rec.stm
    win = ((outcome == jnp.int8(int(GameOutcome.CROSS_WIN))) & (stm == CROSS)) | (
        (outcome == jnp.int8(int(GameOutcome.CIRCLE_WIN))) & (stm == CIRCLE)
    )
    draw = outcome == jnp.int8(int(GameOutcome.DRAW))
    loss = finished & ~win & ~draw
    value_wdl = jnp.stack(
        [win.astype(jnp.float32), draw.astype(jnp.float32), loss.astype(jnp.float32)],
        -1,
    )

    move_idx = jnp.arange(m, dtype=jnp.int32)[:, None]
    length = jnp.broadcast_to(result.game_length[None, :], (m, bsz))
    moves_left = jnp.clip(length - move_idx, 0, moves_left_cap - 1)

    def flat(x):
        return x.reshape((m * bsz,) + x.shape[2:])

    return {
        "board": flat(rec.board),
        "stm": flat(stm),
        "policy": flat(rec.visit_dist),
        "value_wdl": flat(value_wdl),
        "q_value": flat(rec.q_value),
        "q_mask": flat(rec.q_mask),
        "root_value": flat(rec.root_value),
        "moves_left": flat(moves_left),
        "played_move": flat(rec.move),
        "valid": flat(valid),
    }
