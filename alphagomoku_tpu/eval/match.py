"""Paired-game match evaluation: two engines, same openings, colors swapped.

TPU-native counterpart of the reference's evaluation stack
(reference: src/evaluation/{EvaluationManager,EvaluationThread,
EvaluationGame,TwoMatch}.cpp): instead of evaluator threads multiplexing
game state machines onto two NN evaluators, a lockstep batch of 2G games is
laid out so that at every ply exactly one contiguous half is to-move for
each engine — each ply is then two batched searches (one per network), no
wasted evaluations, everything jitted.

Game pair i: game i has engine A as cross, game G+i has engine B as cross,
both replay the same opening (reference: TwoMatch.hpp:16-26).  Scoring is
pentanomial over pairs (0, 1, 2, 3, 4 points) feeding Elo and GSPRT
(reference: src/tuning/GSPRT.cpp convert_match_results).
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..game.types import CROSS, CIRCLE, GameOutcome
from ..game import vectorized as V
from ..search import mcts


class MatchResult(NamedTuple):
    outcomes: np.ndarray  # [2G] int8 GameOutcome
    pentanomial: np.ndarray  # [5] counts of pair points {0..4}
    score_a: float  # A's match score in [0, 1]
    elo_a: float  # Elo of A vs B
    game_lengths: np.ndarray  # [2G]
    truncated: int = 0  # games cut at max_moves and scored as draws


def random_openings(
    rng: np.random.Generator, games: int, rows: int, cols: int, stones: int = 4
) -> np.ndarray:
    """Random central openings with alternating colors [G, H, W] int8
    (stand-in for the reference's balanced OpeningGenerator;
    reference: selfplay/OpeningGenerator.hpp:23-70)."""
    boards = np.zeros((games, rows, cols), np.int8)
    r0, c0 = rows // 2, cols // 2
    span = 3
    for g in range(games):
        cells = set()
        while len(cells) < stones:
            r = int(np.clip(r0 + rng.integers(-span, span + 1), 0, rows - 1))
            c = int(np.clip(c0 + rng.integers(-span, span + 1), 0, cols - 1))
            cells.add((r, c))
        for i, (r, c) in enumerate(sorted(cells)):
            boards[g, r, c] = CROSS if i % 2 == 0 else CIRCLE
    return boards


def play_match(
    net_apply_a: Callable,
    variables_a: Any,
    net_apply_b: Callable,
    variables_b: Any,
    tables: V.RuleTables,
    mcfg: mcts.MCTSConfig,
    num_simulations: int,
    openings: np.ndarray,  # [G, H, W] with an EVEN stone count (cross to move)
    max_moves: int = 160,
    raw_input_a: bool = True,
    raw_input_b: bool = True,
    mcfg_b: mcts.MCTSConfig | None = None,
) -> MatchResult:
    """Run the paired match; returns pentanomial scores and Elo for A.

    `mcfg_b` lets the two engines differ by search configuration alone
    (parameter tuning matches, reference: tuning_launcher)."""
    if mcfg_b is None:
        mcfg_b = mcfg
    g, h, w = openings.shape
    n_stones = int((openings[0] != 0).sum())
    assert n_stones % 2 == 0, "openings must leave cross to move"

    boards0 = np.concatenate([openings, openings], 0)  # [2G, H, W]
    env = V.EnvState(
        board=jnp.asarray(boards0),
        to_move=jnp.full(2 * g, CROSS, jnp.int8),
        outcome=jnp.full(2 * g, int(GameOutcome.UNKNOWN), jnp.int8),
        move_count=jnp.full(2 * g, n_stones, jnp.int32),
    )

    def make_step(a_first: bool):
        """One ply: A searches one half, B the other, env steps all."""

        def step(va, vb, env_state):
            board, stm = env_state.board, env_state.to_move
            ba, bb_ = (board[:g], board[g:]) if a_first else (board[g:], board[:g])
            sa, sb = (stm[:g], stm[g:]) if a_first else (stm[g:], stm[:g])
            st_a = mcts.run_search(
                net_apply_a, va, tables, mcfg, ba, sa, num_simulations,
                raw_input=raw_input_a,
            )
            st_b = mcts.run_search(
                net_apply_b, vb, tables, mcfg_b, bb_, sb, num_simulations,
                raw_input=raw_input_b,
            )
            mv_a = mcts.select_move(st_a)
            mv_b = mcts.select_move(st_b)
            moves = (
                jnp.concatenate([mv_a, mv_b])
                if a_first
                else jnp.concatenate([mv_b, mv_a])
            )
            return V.env_step(tables, env_state, moves // w, moves % w)

        return jax.jit(step)

    step_even = make_step(a_first=True)  # cross to move: A on first half
    step_odd = make_step(a_first=False)

    for ply in range(max_moves - n_stones):
        env = step_even(variables_a, variables_b, env) if ply % 2 == 0 else step_odd(
            variables_a, variables_b, env
        )
        if ply % 8 == 7 and bool(
            jnp.all(env.outcome != jnp.int8(int(GameOutcome.UNKNOWN)))
        ):
            break

    outcomes = np.asarray(env.outcome)
    lengths = np.asarray(env.move_count)

    def points(outcome: int, a_sign: int) -> int:
        """A's points in one game (reference: GSPRT.cpp get_points)."""
        if outcome == int(GameOutcome.DRAW) or outcome == int(GameOutcome.UNKNOWN):
            return 1  # unfinished counts as draw (truncated games)
        won_cross = outcome == int(GameOutcome.CROSS_WIN)
        return 2 if (won_cross == (a_sign == CROSS)) else 0

    penta = np.zeros(5, np.int64)
    total = 0
    for i in range(g):
        p = points(int(outcomes[i]), CROSS) + points(int(outcomes[g + i]), CIRCLE)
        penta[p] += 1
        total += p
    score = total / (4.0 * g)
    truncated = int((outcomes == int(GameOutcome.UNKNOWN)).sum())
    if truncated:
        # systematic non-termination must be visible, not silently scored
        # as draws (the reference adjudicates by outcome only)
        import logging

        logging.getLogger("alphagomoku_tpu.match").warning(
            "%d/%d games truncated at max_moves=%d (scored as draws)",
            truncated, 2 * g, max_moves,
        )
    return MatchResult(
        outcomes, penta, score, elo_from_winrate(score), lengths, truncated
    )


def elo_from_winrate(winrate: float) -> float:
    """(reference: src/tuning/GSPRT.cpp:137-142 elo_from_winrate)"""
    eps = np.finfo(np.float64).eps
    wr = min(1.0 - eps, max(eps, winrate))
    return 400.0 * math.log10(wr / (1.0 - wr))
