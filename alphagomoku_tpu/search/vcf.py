"""Batched VCF solver: victory-by-continuous-fours proof search, lockstep
over a batch of boards.

TPU-native re-expression of the forcing-line core of the reference's
alpha-beta solver (reference: src/search/alpha_beta/{AlphaBetaSearch,
VCFSolver,MoveGenerator}.cpp): the recursive DFS over four-making moves
becomes an iterative fixed-stack state machine advanced by one (attacker
move, forced defender reply) pair per `lax.while_loop` step, all boards in
lockstep.

Soundness model (every claimed WIN is a true forced win):
- attacker candidates are four-making moves (they threaten a five next
  ply); when the defender already threatens a five, candidates are
  restricted to moves that also block it (two or more defender five
  threats end the line),
- the defender's reply is forced: the unique five-completion cell of the
  attacker's four (an immediate defender five ends the line; two or more
  attacker completion cells = double four = win),
- renju: forbidden cells are excluded from black's candidates; a defender
  block that is forbidden for black counts as a win.

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
from ..patterns import features as F
from . import score as S

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


def _five_completions(tables, board, rows, cols, sign):
    """Cells completing a five for `sign` near (rows, cols): bool [B, HW]
    restricted to the 4 lines through the move (all new five threats created
    by a stone lie on its lines)."""
    bsz, h, w = board.shape
    offs = [o for o in range(-4, 5) if o != 0]
    cand_r, cand_c = [], []
    for dr, dc in V.DIRECTION_STEPS:
        for o in offs:
            cand_r.append(rows + o * dr)
            cand_c.append(cols + o * dc)
    rr = jnp.stack(cand_r, -1)  # [B, 32]
    cc = jnp.stack(cand_c, -1)
    inb = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
    rr = jnp.clip(rr, 0, h - 1)
    cc = jnp.clip(cc, 0, w - 1)
    empty = board[jnp.arange(bsz)[:, None], rr, cc] == V.NONE
    wins = V.windows_at_many(board, rr, cc)  # [B, 32, 4]
    pts = V.pattern_types(tables, wins, (sign == CIRCLE)[:, None])
    five = jnp.any(pts == V.T.PT_FIVE, -1) & inb & empty  # [B, 32]
    flat = jnp.zeros((bsz, h * w), bool)
    flat = flat.at[jnp.arange(bsz)[:, None], rr * w + cc].max(five)
    return flat


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
    b = jnp.arange(bsz)

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

    def cond(st: _State):
        return (st.steps < max_steps) & jnp.any(st.status == _SEARCHING)

    def body(st: _State) -> _State:
        searching = st.status == _SEARCHING

        packed = F.encode(tables, st.board, stm)
        legal = ((packed & 1) == 1) & ~(((packed >> U(6)) & 1) == 1)
        own = (packed >> U(8)) & U(0xFFF)
        opp = (packed >> U(20)) & U(0xFFF)
        own5 = legal & (((own >> U(10)) & 1) == 1)
        opp5 = legal & (((opp >> U(10)) & 1) == 1)
        makes_four = legal & (
            (((own >> U(4)) & U(0xF)) != 0)  # half-open four in any direction
            | (((own >> U(8)) & 1) == 1)  # open four
            | (((own >> U(9)) & 1) == 1)  # double four
        )

        # immediate win: a five-completing move exists right now
        win_now = jnp.any(own5, (1, 2)) & searching

        n_opp5 = opp5.sum((1, 2))
        cand = makes_four & jnp.where(
            (n_opp5 > 0)[:, None, None], opp5, jnp.ones_like(opp5)
        )
        cand = cand & (n_opp5 < 2)[:, None, None]
        cand_flat = cand.reshape(bsz, hw) & ~st.tried[b, jnp.clip(st.ply, 0, D - 1)]
        cand_flat = cand_flat & searching[:, None] & ~win_now[:, None]
        has_cand = jnp.any(cand_flat, -1) & (st.ply < D)

        # ---- descend: try the first untried candidate -------------------
        move = jnp.argmax(cand_flat, -1).astype(jnp.int32)  # [B]
        do_desc = has_cand & searching & ~win_now
        mr, mc = move // w, move % w
        board2 = jnp.where(
            do_desc[:, None, None],
            st.board.at[b, mr, mc].set(stm),
            st.board,
        )
        # attacker's five threats after the move
        threats = _five_completions(tables, board2, mr, mc, stm)  # [B, HW]
        threats = threats & do_desc[:, None]
        n_thr = threats.sum(-1)
        double_four_win = do_desc & (n_thr >= 2)

        block = jnp.argmax(threats, -1).astype(jnp.int32)
        br, bc = block // w, block % w
        def_sign = jnp.where(stm == CROSS, CIRCLE, CROSS).astype(jnp.int8)
        # renju: a black defender cannot take a forbidden block
        if tables.rules == GameRules.RENJU:
            forb = V.is_forbidden(tables, board2, br, bc)
            forbidden_block = forb & (def_sign == CROSS)
        else:
            forbidden_block = jnp.zeros(bsz, bool)
        block_wins = do_desc & (n_thr == 1) & forbidden_block

        do_block = do_desc & (n_thr == 1) & ~forbidden_block
        board3 = jnp.where(
            do_block[:, None, None], board2.at[b, br, bc].set(def_sign), board2
        )
        # defender's own five after blocking ends the line (their four was
        # completed by the block)
        def_five = _five_completions(tables, board3, br, bc, def_sign)
        line_fails = do_block & jnp.any(def_five, -1)

        # ---- state updates ----------------------------------------------
        ply_idx = jnp.clip(st.ply, 0, D - 1)
        tried = st.tried.at[b, ply_idx, move].max(do_desc)

        advanced = do_block & ~line_fails
        won = win_now | double_four_win | block_wins

        att_moves = st.att_moves.at[b, ply_idx].set(
            jnp.where(advanced | won & do_desc, move, st.att_moves[b, ply_idx])
        )
        def_moves = st.def_moves.at[b, ply_idx].set(
            jnp.where(advanced, block, st.def_moves[b, ply_idx])
        )

        # failed lines: undo the attacker (and defender) stones
        undo_line = line_fails
        board4 = jnp.where(
            undo_line[:, None, None],
            board3.at[b, mr, mc].set(V.NONE).at[b, br, bc].set(V.NONE),
            board3,
        )

        # ---- backtrack: no candidates at this ply -----------------------
        do_back = searching & ~win_now & ~do_desc
        at_root = st.ply == 0
        fail_now = do_back & at_root
        pop = do_back & ~at_root
        prev_idx = jnp.clip(st.ply - 1, 0, D - 1)
        pa = st.att_moves[b, prev_idx]
        pd = st.def_moves[b, prev_idx]
        par, pac = jnp.clip(pa, 0, hw - 1) // w, jnp.clip(pa, 0, hw - 1) % w
        pdr, pdc = jnp.clip(pd, 0, hw - 1) // w, jnp.clip(pd, 0, hw - 1) % w
        board5 = jnp.where(
            pop[:, None, None],
            board4.at[b, par, pac].set(V.NONE).at[b, pdr, pdc].set(V.NONE),
            board4,
        )
        # clear the tried set of the ply being abandoned
        tried = jnp.where(
            pop[:, None, None] & (jnp.arange(D)[None, :, None] == ply_idx[:, None, None]),
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
    packed0 = F.encode(tables, board, stm)
    legal0 = ((packed0 & 1) == 1) & ~(((packed0 >> U(6)) & 1) == 1)
    own5_0 = (legal0 & ((((packed0 >> U(8)) >> U(10)) & 1) == 1)).reshape(bsz, hw)
    imm = jnp.argmax(own5_0, -1).astype(jnp.int32)
    has_imm = jnp.any(own5_0, -1)
    first = jnp.where(
        final.att_moves[:, 0] >= 0, final.att_moves[:, 0], imm
    )
    first = jnp.where(win, jnp.where(has_imm, imm, first), -1)
    distance = jnp.where(win, 2 * final.ply + final.win_extra, 0)
    return VCFResult(win=win, best_move=first, distance=distance)
