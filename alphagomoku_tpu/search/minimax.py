"""Host validation minimax over the staged move generator.

Counterpart of the reference's MinimaxSearch
(reference: src/search/alpha_beta/MinimaxSearch.cpp — the reference ships
the class with its algorithm COMMENTED OUT, as a validation scaffold; this
module implements the documented algorithm so it can actually be used to
validate the batched solvers in tests: depth-limited negamax where each
node's move list comes from MoveGenerator.generate and statically proven
scores cut off immediately, MinimaxSearch.cpp:80-113).

Host-side NumPy (a test oracle, not a hot path).  Scores are the packed
16-bit host ints of search/move_generator.py.
"""

from __future__ import annotations

import numpy as np

from ..game.types import GameRules, NONE, invert_sign
from . import move_generator as MG


def invert_up(s: int) -> int:
    """Child score -> parent view: negate + one ply farther
    (reference: Score::invert_up = -score with increased distance)."""
    pv = s >> 13
    ev = (s & 8191) - 4000
    if s in (0, 0xFFFF):
        return 0xFFFF if s == 0 else 0
    if pv == MG._PV_WIN:
        return MG.loss_in(-ev + 1)
    if pv == MG._PV_LOSS:
        return MG.win_in(ev + 1)
    if pv == MG._PV_DRAW:
        return MG.draw_in(ev + 1)
    return MG.score(-ev)


def solve(
    board: np.ndarray,
    stm: int,
    rules: GameRules,
    depth: int = 4,
    mode: str | None = None,
    draw_after: int | None = None,
    node_budget: int = 200000,
) -> tuple[int, dict]:
    """Negamax to `depth` plies; returns (packed score from `stm`'s view,
    {(row, col): packed score} for the root actions).

    UNKNOWN propagates as the reference's evaluate() stub does (Score()),
    so a non-proven subtree yields UNKNOWN — only PROVEN results are
    meaningful, which is exactly what a validation oracle needs."""
    board = np.asarray(board, np.int8).copy()
    state = {"nodes": 0}

    def rec(sign: int, d: int, root: bool = False) -> tuple[int, dict | None]:
        state["nodes"] += 1
        # reference: OPTIMAL at the root (full list for the caller), the
        # tactical THREATS mode below (AlphaBetaSearch.cpp:236 mode pick)
        gen_mode = mode if mode is not None else ("optimal" if root else "threats")
        actions, static_score = MG.generate(
            board, sign, rules, mode=gen_mode, draw_after=draw_after
        )
        if MG.is_proven(static_score):
            return static_score, dict(actions.moves)
        if d <= 0 or state["nodes"] >= node_budget:
            return MG.UNKNOWN, dict(actions.moves)
        best = MG.MIN_VALUE
        out = {}
        for rc in actions.locations():
            s0 = actions.moves[rc]
            if MG.is_proven(s0):
                sc = s0
            else:
                board[rc] = sign
                child, _ = rec(invert_sign(sign), d - 1)
                board[rc] = NONE
                sc = invert_up(child)
            out[rc] = sc
            best = max(best, sc)
            if MG.is_win(sc):
                break
        if best == MG.MIN_VALUE:
            best = MG.UNKNOWN
        # a fail-low LOSS (or DRAW) is only proven over a complete move set
        if not actions.is_fully_expanded and not MG.is_win(best) and (
            MG.is_proven(best)
        ):
            best = MG.UNKNOWN
        return best, out

    score, root_actions = rec(int(stm), int(depth), root=True)
    return score, (root_actions or {})
