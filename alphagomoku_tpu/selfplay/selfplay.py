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
    visits = tree.edge_visits[rb, state.root_node]
    vsum = tree.edge_value_sum[rb, state.root_node]
    valid = (actions != mcts.NULL) & (visits > 0)
    q = vsum / jnp.maximum(visits.astype(jnp.float32), 1.0)[..., None]
    b = jnp.arange(bsz)[:, None]
    idx = jnp.clip(actions, 0, h * w - 1)
    qmap = jnp.zeros((bsz, h * w, 2), jnp.float32)
    qmap = qmap.at[b, idx].add(jnp.where(valid[..., None], q, 0.0))
    mmap = jnp.zeros((bsz, h * w), bool)
    mmap = mmap.at[b, idx].max(valid)
    return qmap.reshape(bsz, h, w, 2), mmap.reshape(bsz, h, w)


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
) -> SelfplayResult:
    """Play `batch` games in lockstep; jit the caller.

    Finished games freeze (env_step no-ops) and their samples are marked
    dead; the final outcome is backfilled into every sample of the game."""

    env = V.env_reset(batch, rows, cols)
    mcfg = mcfg._replace(
        noise_weight=scfg.noise_weight, noise_alpha=scfg.noise_alpha
    )

    def move_step(carry, inp):
        envc = carry
        move_idx, k = inp
        k_noise, k_sample = jax.random.split(k)

        state = mcts.run_search(
            net_apply,
            variables,
            tables,
            mcfg,
            envc.board,
            envc.to_move,
            scfg.num_simulations,
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
        sample = GameRecord(
            board=envc.board,
            stm=envc.to_move,
            visit_dist=dist,
            q_value=qmap,
            q_mask=qmask,
            root_value=rval,
            move=move,
            alive=alive,
        )
        newenv = V.env_step(tables, envc, move // cols, move % cols)
        return newenv, sample

    keys = jax.random.split(key, scfg.max_moves)
    steps = jnp.arange(scfg.max_moves)
    env, record = jax.lax.scan(move_step, env, (steps, keys))

    return SelfplayResult(
        record=record, outcome=env.outcome, game_length=env.move_count
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
