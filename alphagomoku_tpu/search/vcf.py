"""Batched VCF solver: victory-by-continuous-fours proof search, lockstep
over a batch of boards.

TPU-native re-expression of the forcing-line core of the reference's
alpha-beta solver (reference: src/search/alpha_beta/{AlphaBetaSearch,
VCFSolver,MoveGenerator}.cpp): the recursive DFS over four-making moves
becomes an iterative fixed-stack state machine advanced by one (attacker
move, forced defender reply) pair per `lax.while_loop` step, all boards in
lockstep.  Every per-step read/write is a one-hot masked select (gathers /
scatters serialize on TPU), and threat detection is one full-plane compiled
classification per board state (search/lockstep.py).

Soundness model (every claimed WIN is a true forced win):
- attacker candidates are four-making moves (they threaten a five next
  ply); when the defender already threatens a five, candidates are
  restricted to moves that also block it (two or more defender five
  threats end the line),
- the defender's reply is forced: the unique five-completion cell of the
  attacker's four (an immediate defender five ends the line; two or more
  attacker completion cells = double four = win),
- renju: every possibly-forbidden cell (overline / double-four / 4x4 fork /
  naive 3x3 fork — a superset of the truly forbidden set, so sound) is
  excluded from black's candidates; a defender block that is forbidden for
  black counts as a win; a black five trumps a forbidden cell.

The search never claims LOSS/DRAW — failures just mean "no VCF within the
depth/step budget" (reference semantics: solver returns UNKNOWN).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..game.types import CROSS, CIRCLE, GameRules
from ..game import vectorized as V
from ..patterns import bitwise
from . import lockstep as L

U = np.uint32


class VCFResult(NamedTuple):
    win: jax.Array  # [B] bool: VCF win proven for the side to move
    best_move: jax.Array  # [B] int32 flat first move of the winning line (-1)
    distance: jax.Array  # [B] int32 plies to mate (0 when unproven)


class _State(NamedTuple):
    board: jax.Array  # [B, H, W] int8 (mutated along the line)
    ply: jax.Array  # [B] int32 current attacker depth (0-based)
    att_moves: jax.Array  # [B, D] int32 flat attacker moves (-1 empty)
    def_moves: jax.Array  # [B, D] int32 flat defender replies (-1 empty)
    tried: jax.Array  # [B, D, HW] bool: attacker moves already explored
    status: jax.Array  # [B] int8: 0 searching, 1 win, 2 fail/exhausted
    win_extra: jax.Array  # [B] int32: plies beyond 2*ply at the win (1 or 3)
    steps: jax.Array  # [] int32 iteration counter


_SEARCHING, _WIN, _FAIL = 0, 1, 2


def solve(
    tables: V.RuleTables,
    board: jax.Array,
    stm: jax.Array,
    max_depth: int = 10,
    max_steps: int = 256,
) -> VCFResult:
    """Run the batched VCF for the side to move (jit the caller).

    max_depth: attacker plies; max_steps: lockstep loop budget shared by
    descends and backtracks (reference: solver node/depth limits,
    AlphaBetaSearch.hpp:34-39)."""
    board = jnp.asarray(board)
    bsz, h, w = board.shape
    hw = h * w
    D = max_depth
    rules = GameRules(tables.rules)
    renju = rules == GameRules.RENJU
    stm_is_circle = stm == CIRCLE
    own_cross = (~stm_is_circle)[:, None, None]
    def_sign = jnp.where(stm == CROSS, CIRCLE, CROSS).astype(jnp.int8)

    state = _State(
        board=board,
        ply=jnp.zeros(bsz, jnp.int32),
        att_moves=jnp.full((bsz, D), -1, jnp.int32),
        def_moves=jnp.full((bsz, D), -1, jnp.int32),
        tried=jnp.zeros((bsz, D, hw), bool),
        status=jnp.full(bsz, _SEARCHING, jnp.int8),
        win_extra=jnp.zeros(bsz, jnp.int32),
        steps=jnp.zeros((), jnp.int32),
    )

    def own_theirs(board_, kinds=None):
        pt_cross, pt_circle = L.classify(board_, rules, kinds)
        own_pts = jnp.where(stm_is_circle[:, None, None, None], pt_circle, pt_cross)
        opp_pts = jnp.where(stm_is_circle[:, None, None, None], pt_cross, pt_circle)
        return own_pts, opp_pts

    def cond(st: _State):
        return (st.steps < max_steps) & jnp.any(st.status == _SEARCHING)

    def body(st: _State) -> _State:
        searching = st.status == _SEARCHING
        empty = st.board == V.NONE

        own_pts, opp_pts = own_theirs(st.board, bitwise.THREAT_KINDS)
        mine = L.actor_planes(own_pts, empty, own_cross, renju)
        theirs = L.actor_planes(opp_pts, empty, ~own_cross, renju)
        own5 = mine["five"]
        opp5 = theirs["five"]
        makes_four = mine["four"] & ~mine["maybe_forb"]

        # immediate win: a five-completing move exists right now
        win_now = jnp.any(own5, (1, 2)) & searching

        n_opp5 = opp5.sum((1, 2))
        cand = makes_four & jnp.where(
            (n_opp5 > 0)[:, None, None], opp5, jnp.ones_like(opp5)
        )
        cand = cand & (n_opp5 < 2)[:, None, None]
        ply_idx = jnp.clip(st.ply, 0, D - 1)
        cand_flat = cand.reshape(bsz, hw) & ~L.plane_at(st.tried, ply_idx)
        cand_flat = cand_flat & searching[:, None] & ~win_now[:, None]
        has_cand = jnp.any(cand_flat, -1) & (st.ply < D)

        # ---- descend: try the first untried candidate -------------------
        move = jnp.argmax(cand_flat, -1).astype(jnp.int32)  # [B]
        do_desc = has_cand & searching & ~win_now
        board2 = L.place(st.board, do_desc, move, stm)

        # attacker's five threats after the move (all new fives go through
        # the new stone; pre-existing fives would have fired win_now)
        threats = L.five_plane_of(board2, rules, stm_is_circle).reshape(bsz, hw)
        threats = threats & do_desc[:, None]
        n_thr = threats.sum(-1)
        double_four_win = do_desc & (n_thr >= 2)

        block = jnp.argmax(threats, -1).astype(jnp.int32)
        # renju: a black defender cannot take a forbidden block
        if renju:
            forb = V.is_forbidden(tables, board2, block // w, block % w)
            forbidden_block = forb & (def_sign == CROSS)
        else:
            forbidden_block = jnp.zeros(bsz, bool)
        block_wins = do_desc & (n_thr == 1) & forbidden_block

        do_block = do_desc & (n_thr == 1) & ~forbidden_block
        board3 = L.place(board2, do_block, block, def_sign)
        # defender's own five after blocking ends the line (their four was
        # completed by the block)
        def_five = L.five_plane_of(board3, rules, ~stm_is_circle).reshape(bsz, hw)
        line_fails = do_block & jnp.any(def_five, -1)

        # ---- state updates ----------------------------------------------
        tried = st.tried | (
            (jnp.arange(D)[None, :, None] == ply_idx[:, None, None])
            & do_desc[:, None, None]
            & (move[:, None] == jnp.arange(hw, dtype=jnp.int32)[None, :])[:, None, :]
        )

        advanced = do_block & ~line_fails
        won = win_now | double_four_win | block_wins

        att_moves = L.set_col(st.att_moves, ply_idx, advanced | (won & do_desc), move)
        def_moves = L.set_col(st.def_moves, ply_idx, advanced, block)

        # failed lines: undo the attacker (and defender) stones
        board4 = L.unplace(board3, line_fails, move)
        board4 = L.unplace(board4, line_fails, block)

        # ---- backtrack: no candidates at this ply -----------------------
        do_back = searching & ~win_now & ~do_desc
        at_root = st.ply == 0
        fail_now = do_back & at_root
        pop = do_back & ~at_root
        prev_idx = jnp.clip(st.ply - 1, 0, D - 1)
        pa = L.col_at(st.att_moves, prev_idx)
        pd = L.col_at(st.def_moves, prev_idx)
        board5 = L.unplace(board4, pop & (pa >= 0), jnp.clip(pa, 0, hw - 1))
        board5 = L.unplace(board5, pop & (pd >= 0), jnp.clip(pd, 0, hw - 1))
        # clear the tried set of the ply being abandoned
        tried = jnp.where(
            pop[:, None, None]
            & (jnp.arange(D)[None, :, None] == ply_idx[:, None, None]),
            False,
            tried,
        )

        new_ply = jnp.where(advanced, st.ply + 1, jnp.where(pop, st.ply - 1, st.ply))
        new_status = jnp.where(
            won & searching,
            jnp.int8(_WIN),
            jnp.where(fail_now, jnp.int8(_FAIL), st.status),
        )
        # mate distance: an available five mates in 1 extra ply; a double
        # four / unblockable four needs (our four, any reply, our five) = 3
        new_extra = jnp.where(
            won & searching, jnp.where(win_now, 1, 3), st.win_extra
        )

        return _State(
            board=board5,
            ply=new_ply,
            att_moves=att_moves,
            def_moves=def_moves,
            tried=tried,
            status=new_status,
            win_extra=new_extra,
            steps=st.steps + 1,
        )

    final = jax.lax.while_loop(cond, body, state)

    win = final.status == _WIN
    # first attacker move of the winning line; if the win was found at ply 0
    # before any line move (immediate five), recompute the five cell
    own5_0 = L.five_plane_of(board, rules, stm_is_circle).reshape(bsz, hw)
    imm = jnp.argmax(own5_0, -1).astype(jnp.int32)
    has_imm = jnp.any(own5_0, -1)
    first = jnp.where(
        final.att_moves[:, 0] >= 0, final.att_moves[:, 0], imm
    )
    first = jnp.where(win, jnp.where(has_imm, imm, first), -1)
    distance = jnp.where(win, 2 * final.ply + final.win_extra, 0)
    return VCFResult(win=win, best_move=first, distance=distance)
