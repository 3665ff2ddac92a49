"""Batched VCT solver: victory-by-continuous-threats (fours AND open
threes) AND-OR proof search, lockstep over a batch of boards.

TPU-native re-expression of the reference's threat-space search
(reference: src/search/alpha_beta/{ThreatSpaceSearch,ThreatGenerator}.cpp
and AlphaBetaSearch.cpp:76-135): the recursive AND-OR DFS becomes an
iterative fixed-stack machine advanced one transition per
`lax.while_loop` step, all boards in lockstep.  It extends the VCF
machine (search/vcf.py) with a defender-alternative axis: when the
attacker plays an open-three move the defender is NOT forced — the
complete defender option set (defensive-move tables + counter-fours)
forms an AND node whose options must ALL be refuted.

A per-board transposition table plays the role of the reference's
SharedHashTable (reference: include/.../SharedHashTable.hpp:27-88): failed
positions are stored with their remaining (depth, three-budget) so
re-reached positions fail immediately.  Entries are read/written with
one-hot masked selects (per-batch-row gathers/scatters serialize on TPU).

Soundness model (every claimed WIN is a true forced win):
- OR nodes: attacker candidates are five/four/open-four makers, plus
  open-three makers while the three-budget lasts; when the defender
  threatens a five, candidates shrink to four-makers that also block.
- AND nodes: after an open-three move the defender options are the
  defensive-table cells of the threat (complete by table construction,
  patterns/defensive.py) unioned with the defender's PRE-move four/five
  makers (a superset of the post-move set: the attacker's stone can only
  remove defender fours).  Every option must be refuted; option sets
  exceeding `max_defenses` abandon the line (never unsound).
- Renju: black-attacker candidates exclude every possibly-forbidden cell
  (overline / double-four / 4x4 fork / naive 3x3 fork — a superset of the
  truly forbidden set, so sound); a forced defender block that is
  CERTAINLY forbidden for black (overline / 4x4, no recursion involved)
  counts as a win; forbidden defender options are conservatively kept
  (the attacker must refute them too — incomplete, sound).

The search never claims LOSS/DRAW — failure means "no VCT within the
budgets" (reference semantics: the solver returns UNKNOWN).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..game.types import CROSS, CIRCLE, GameRules
from ..game import vectorized as V
from ..patterns import bitwise
from ..patterns import defensive as DEF
from ..patterns import tables as T
from . import lockstep as L

U = np.uint32


class VCTBatchedResult(NamedTuple):
    win: jax.Array  # [B] bool: forced win proven for the side to move
    best_move: jax.Array  # [B] int32 flat first move of the proof (-1)
    distance: jax.Array  # [B] int32 plies to mate (0 when unproven)


_SEARCHING, _WIN, _FAIL = 0, 1, 2
_ADV, _RETW, _RETF = 0, 1, 2
_TT_BIG_DEPTH = 127  # depth-independent fail entries (static refutations)


_hash_boards = L.hash_boards


def _ext_windows_at_one(board: jax.Array, rows: jax.Array, cols: jax.Array) -> jax.Array:
    """26-bit 13-cell extended windows at ONE empty cell per board:
    [B, H, W] + [B] -> [B, 4] (reference: RawPatternCalculator extended
    window extraction).  Gather-free: the inner 11 cells come from
    windows_at_one, the two edge cells (offsets +-6) from one-hot masked
    reduces of an ILLEGAL-padded board."""
    bsz, h, w = board.shape
    inner = V.windows_at_one(board, rows, cols)  # [B, 4], center empty
    ext = inner << U(2)  # offsets -5..5 move to positions 1..11; center = NONE
    p6 = jnp.pad(
        board, ((0, 0), (6, 6), (6, 6)), constant_values=V.ILLEGAL
    ).astype(jnp.uint32)
    onehot = (
        (jnp.arange(h, dtype=jnp.int32)[None, :, None] == rows[:, None, None])
        & (jnp.arange(w, dtype=jnp.int32)[None, None, :] == cols[:, None, None])
    )
    cols_out = []
    for d, (dr, dc) in enumerate(V.DIRECTION_STEPS):
        acc = ext[:, d]
        for off, pos in ((-6, 0), (6, 12)):
            sl = p6[:, 6 + off * dr : 6 + off * dr + h, 6 + off * dc : 6 + off * dc + w]
            cell = jnp.where(onehot, sl, U(0)).sum((1, 2), dtype=jnp.uint32)
            acc = acc | (cell << U(2 * pos))
        cols_out.append(acc)
    return jnp.stack(cols_out, axis=-1)


class _State(NamedTuple):
    board: jax.Array  # [B, H, W] int8 (mutated along the line)
    ply: jax.Array  # [B] int32 current frame depth (0-based)
    phase: jax.Array  # [B] int8: ADV / RET_WIN / RET_FAIL
    att_move: jax.Array  # [B, D] int32 current attacker candidate per ply
    def_move: jax.Array  # [B, D] int32 current defender option per ply
    att_tried: jax.Array  # [B, D, HW] bool
    def_opts: jax.Array  # [B, D, HW] bool: defender AND-set per ply
    def_tried: jax.Array  # [B, D, HW] bool: refuted defender options
    threes_left: jax.Array  # [B, D+1] int32 three-budget at frame entry
    tt_hash: jax.Array  # [B, S] uint32 verification hashes
    tt_depth: jax.Array  # [B, S] int32 remaining depth proven failed
    tt_threes: jax.Array  # [B, S] int32 three-budget proven failed
    status: jax.Array  # [B] int8
    win_extra: jax.Array  # [B] int32 plies beyond 2*win_ply at the win
    win_ply: jax.Array  # [B] int32 frame depth where the win closed
    steps: jax.Array  # [] int32


def solve(
    tables: V.RuleTables,
    board: jax.Array,
    stm: jax.Array,
    max_depth: int = 8,
    max_steps: int = 384,
    max_defenses: int = 12,
    max_threes: int = 3,
    tt_slots: int = 128,
) -> VCTBatchedResult:
    """Run the batched VCT for the side to move (jit the caller).

    max_depth: attacker plies; max_steps: lockstep transition budget shared
    by descends and backtracks; max_defenses: AND-node width cap (wider
    nodes abandon the line); max_threes: open-three moves per line
    (reference: TSS positional budgets, ThreatSpaceSearch.hpp:61-66)."""
    board = jnp.asarray(board)
    stm = jnp.asarray(stm)
    bsz, h, w = board.shape
    hw = h * w
    D = max_depth
    S = tt_slots
    rules = GameRules(tables.rules)
    renju = rules == GameRules.RENJU
    b = jnp.arange(bsz)
    stm_is_circle = stm == CIRCLE
    def_sign = jnp.where(stm == CROSS, CIRCLE, CROSS).astype(jnp.int8)
    def_is_circle = ~stm_is_circle

    state = _State(
        board=board,
        ply=jnp.zeros(bsz, jnp.int32),
        phase=jnp.zeros(bsz, jnp.int8),
        att_move=jnp.full((bsz, D), -1, jnp.int32),
        def_move=jnp.full((bsz, D), -1, jnp.int32),
        att_tried=jnp.zeros((bsz, D, hw), bool),
        def_opts=jnp.zeros((bsz, D, hw), bool),
        def_tried=jnp.zeros((bsz, D, hw), bool),
        threes_left=jnp.concatenate(
            [jnp.full((bsz, 1), max_threes, jnp.int32),
             jnp.zeros((bsz, D), jnp.int32)], axis=1),
        tt_hash=jnp.zeros((bsz, S), jnp.uint32),
        tt_depth=jnp.full((bsz, S), -1, jnp.int32),
        tt_threes=jnp.full((bsz, S), -1, jnp.int32),
        status=jnp.full(bsz, _SEARCHING, jnp.int8),
        win_extra=jnp.zeros(bsz, jnp.int32),
        win_ply=jnp.zeros(bsz, jnp.int32),
        steps=jnp.zeros((), jnp.int32),
    )

    plane_at, set_plane = L.plane_at, L.set_plane
    col_at, set_col = L.col_at, L.set_col
    place, unplace = L.place, L.unplace

    def cond(st: _State):
        return (st.steps < max_steps) & jnp.any(st.status == _SEARCHING)

    def body(st: _State) -> _State:
        searching = st.status == _SEARCHING
        adv = searching & (st.phase == _ADV)
        retw = searching & (st.phase == _RETW)
        retf = searching & (st.phase == _RETF)
        ply_idx = jnp.clip(st.ply, 0, D - 1)

        # ================= ADVANCE =================
        pt_cross, pt_circle = L.classify(st.board, rules, bitwise.THREAT_KINDS)
        own_pts = jnp.where(stm_is_circle[:, None, None, None], pt_circle, pt_cross)
        opp_pts = jnp.where(stm_is_circle[:, None, None, None], pt_cross, pt_circle)
        empty = st.board == V.NONE

        own_cross = (~stm_is_circle)[:, None, None]
        mine = L.actor_planes(own_pts, empty, own_cross, renju)
        theirs = L.actor_planes(opp_pts, empty, ~own_cross, renju)

        own5 = mine["five"]
        opp5 = theirs["five"]
        win_now = jnp.any(own5, (1, 2)) & adv
        n_opp5 = opp5.sum((1, 2))
        static_fail = (n_opp5 >= 2) & adv & ~win_now

        # --- transposition probe (one-hot slot read) ---
        h1, h2 = _hash_boards(st.board)
        slot = (h1 & U(S - 1)).astype(jnp.int32)
        slot_sel = slot[:, None] == jnp.arange(S, dtype=jnp.int32)[None, :]
        e_hash = jnp.where(slot_sel, st.tt_hash, U(0)).sum(1, dtype=jnp.uint32)
        e_depth = jnp.where(slot_sel, st.tt_depth, 0).sum(1).astype(jnp.int32)
        e_threes = jnp.where(slot_sel, st.tt_threes, 0).sum(1).astype(jnp.int32)
        rem = D - st.ply
        tl = col_at(st.threes_left, st.ply)
        tt_fail = (
            adv & ~win_now & ~static_fail
            & (e_depth >= rem) & (e_threes >= tl) & (e_hash == h2)
            & (e_depth >= 0)
        )
        depth_fail = adv & ~win_now & ~static_fail & ~tt_fail & (st.ply >= D)

        # --- candidate selection (OR node) ---
        maybe_forb_own = mine["maybe_forb"] if renju else jnp.zeros_like(own5)
        cand = (mine["four"] | mine["win3"]) & ~maybe_forb_own
        three_ok = (tl > 0)[:, None, None]
        cand = cand | (mine["three"] & three_ok)
        cand = jnp.where((n_opp5 > 0)[:, None, None],
                         mine["four"] & opp5 & ~maybe_forb_own, cand)
        cand_flat = cand.reshape(bsz, hw) & ~plane_at(st.att_tried, ply_idx)
        can_advance = adv & ~win_now & ~static_fail & ~tt_fail & ~depth_fail
        cand_flat = cand_flat & can_advance[:, None]
        # priority: open-four/fork makers, then fours, then threes (fork
        # threes first) — reference: staged generation order,
        # ThreatGenerator.hpp:78-88
        prio3 = mine["win3"].reshape(bsz, hw)
        prio2 = mine["four"].reshape(bsz, hw)
        n3f = mine["n3"].reshape(bsz, hw)
        prio = jnp.where(prio3, 64, jnp.where(prio2, 32, 8)) + n3f
        prio = jnp.where(cand_flat, prio, 0)
        has_cand = jnp.any(cand_flat, -1)
        exhausted = can_advance & ~has_cand

        move = jnp.argmax(prio, -1).astype(jnp.int32)
        do_try = can_advance & has_cand
        mr, mc = move // w, move % w
        board2 = place(st.board, do_try, move, stm)

        # attacker five threats (a five wins in renju even on an
        # otherwise-forbidden cell: five trumps forbidden, and PT_FIVE is
        # already renju-exact for black).  All new fives flow through the
        # new stone; pre-existing ones would have fired win_now.
        threats = L.five_plane_of(board2, rules, stm_is_circle).reshape(bsz, hw)
        threats = threats & do_try[:, None]
        n_thr = threats.sum(-1)
        win_dd = do_try & (n_thr >= 2)  # double four: unstoppable

        block = jnp.argmax(threats, -1).astype(jnp.int32)
        if renju:
            # forced block CERTAINLY forbidden for a black defender -> win.
            # Classified on the post-move board (the attacker's stone can
            # only have removed black patterns, so post-move is exact here).
            blk_wins = V.windows_at_one(board2, block // w, block % w)  # [B,4]
            # compiled bit math (the pattern_types table read is a serialized
            # gather); four-kinds-and-up are exact without lower priorities
            blk_pts, _ = bitwise.classify(
                blk_wins, rules,
                ("five", "overline", "open_four", "double_four",
                 "half_open_four"),
            )
            blk_n4 = (
                (blk_pts == T.PT_HALF_OPEN_4)
                | (blk_pts == T.PT_OPEN_4)
                | (blk_pts == T.PT_DOUBLE_4)
            ).sum(-1)
            block_forb = (
                jnp.any(blk_pts == T.PT_OVERLINE, -1)
                | jnp.any(blk_pts == T.PT_DOUBLE_4, -1)
                | (blk_n4 >= 2)
            ) & (def_sign == CROSS)
        else:
            block_forb = jnp.zeros(bsz, bool)
        win_blk = do_try & (n_thr == 1) & block_forb

        forced = do_try & (n_thr == 1) & ~block_forb

        # --- AND-node option set for open-three moves (n_thr == 0) ---
        is_three_move = do_try & (n_thr == 0)
        ext = _ext_windows_at_one(st.board, mr, mc)  # [B, 4] pre-move
        dmask = DEF.get_moves_batched(
            rules, ext, jnp.broadcast_to(def_is_circle[:, None], (bsz, 4)),
            T.PT_OPEN_3,
        ).astype(jnp.uint32)  # [B, 4] 13-bit masks
        pts_at_m = jnp.where(
            (move[:, None] == jnp.arange(hw, dtype=jnp.int32)[None, :])[:, :, None],
            own_pts.reshape(bsz, hw, 4), 0,
        ).sum(1)  # [B, 4]
        dir_is3 = pts_at_m == T.PT_OPEN_3
        # vectorized over all (direction, ext-offset) pairs in ONE fused
        # [B, 4, 13, HW] expression (the scalar double loop emitted ~100
        # tiny kernels per lockstep step)
        steps_np = np.asarray(V.DIRECTION_STEPS, np.int32)  # [4, 2]
        offs = np.arange(DEF.EXT_LENGTH, dtype=np.int32) - DEF.CENTER  # [13]
        bit = ((dmask[:, :, None] >> jnp.asarray(
            np.arange(DEF.EXT_LENGTH, dtype=np.uint32))[None, None, :]) & 1) == 1
        rr = mr[:, None, None] + offs[None, None, :] * steps_np[None, :, 0:1]
        cc = mc[:, None, None] + offs[None, None, :] * steps_np[None, :, 1:2]
        ok = (
            bit & dir_is3[:, :, None]
            & (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
        )  # [B, 4, 13]
        cell = jnp.clip(rr, 0, h - 1) * w + jnp.clip(cc, 0, w - 1)
        opts = jnp.any(
            (cell[..., None] == jnp.arange(hw, dtype=jnp.int32))
            & ok[..., None],
            axis=(1, 2),
        )  # [B, HW]
        # counter-fours: pre-move defender four/five makers (superset of
        # the post-move set — an attacker stone only removes defender fours)
        opts = opts | (theirs["four"] | opp5).reshape(bsz, hw)
        opts = opts & (board2 == V.NONE).reshape(bsz, hw)
        opts = opts & is_three_move[:, None]
        n_opts = opts.sum(-1)
        # a candidate that created neither a five threat nor an open three
        # is non-forcing (stale classification edge case): abandon it rather
        # than ever counting it as a win
        real3 = jnp.any(dir_is3, -1)
        win_nodef = is_three_move & real3 & (n_opts == 0)
        too_wide = is_three_move & ((n_opts > max_defenses) | ~real3) & ~win_nodef
        do_and = is_three_move & real3 & ~win_nodef & ~too_wide

        first_opt = jnp.argmax(opts, -1).astype(jnp.int32)
        reply = jnp.where(forced, block, first_opt)
        descend = forced | do_and
        board3 = place(board2, descend, reply, def_sign)
        # abandoned candidates (too_wide) keep the pre-move board
        board3 = jnp.where(too_wide[:, None, None], st.board, board3)

        won_adv = win_now | win_dd | win_blk | win_nodef
        fail_adv = static_fail | tt_fail | depth_fail | exhausted

        # --- TT insert on frame failure ---
        ins = fail_adv & ~tt_fail  # tt hits need no re-store
        ins_depth = jnp.where(static_fail, _TT_BIG_DEPTH, rem)
        ins_threes = jnp.where(static_fail, _TT_BIG_DEPTH, tl)
        wsel = slot_sel & ins[:, None]
        tt_hash = jnp.where(wsel, h2[:, None], st.tt_hash)
        tt_depth = jnp.where(wsel, ins_depth[:, None], st.tt_depth)
        tt_threes = jnp.where(wsel, ins_threes[:, None], st.tt_threes)

        # --- ADVANCE state writes ---
        att_tried = st.att_tried | (
            (jnp.arange(D)[None, :, None] == ply_idx[:, None, None])
            & do_try[:, None, None]
            & (move[:, None] == jnp.arange(hw, dtype=jnp.int32)[None, :])[:, None, :]
        )
        att_move = set_col(st.att_move, ply_idx, do_try, move)
        def_move = set_col(st.def_move, ply_idx, descend, reply)
        def_opts = set_plane(
            st.def_opts, ply_idx, descend,
            jnp.where(forced[:, None],
                      (block[:, None] == jnp.arange(hw, dtype=jnp.int32)[None, :]),
                      opts))
        def_tried = set_plane(
            st.def_tried, ply_idx, descend, jnp.zeros((bsz, hw), bool))
        threes_spent = is_three_move.astype(jnp.int32)
        threes_left = set_col(
            st.threes_left, jnp.clip(st.ply + 1, 0, D), descend, tl - threes_spent)

        new_board = board3
        new_ply = jnp.where(descend, st.ply + 1, st.ply)
        new_phase = jnp.where(
            won_adv & adv, jnp.int8(_RETW),
            jnp.where(fail_adv & adv, jnp.int8(_RETF), st.phase))
        # wins close with the board at frame-entry state
        new_board = jnp.where((won_adv & adv)[:, None, None], st.board, new_board)
        win_extra = jnp.where(
            won_adv & adv, jnp.where(win_now, 1, 3), st.win_extra)
        win_ply = jnp.where(won_adv & adv, st.ply, st.win_ply)
        # remember the closing candidate for best-move reporting
        att_move = set_col(att_move, ply_idx, (win_dd | win_blk | win_nodef), move)

        # ================= RET_WIN =================
        at_root = st.ply == 0
        retw_done = retw & at_root
        retw_pop = retw & ~at_root
        q = jnp.clip(st.ply - 1, 0, D - 1)
        dmq = col_at(st.def_move, q)
        amq = col_at(st.att_move, q)
        new_board = unplace(new_board, retw_pop, dmq)
        def_tried = def_tried | (
            (jnp.arange(D)[None, :, None] == q[:, None, None])
            & retw_pop[:, None, None]
            & (dmq[:, None] == jnp.arange(hw, dtype=jnp.int32)[None, :])[:, None, :]
        )
        remaining = plane_at(def_opts, q) & ~plane_at(def_tried, q)
        more = retw_pop & jnp.any(remaining, -1)
        closed = retw_pop & ~jnp.any(remaining, -1)
        o2 = jnp.argmax(remaining, -1).astype(jnp.int32)
        new_board = place(new_board, more, o2, def_sign)
        def_move = set_col(def_move, q, more, o2)
        new_phase = jnp.where(more, jnp.int8(_ADV), new_phase)
        new_board = unplace(new_board, closed, amq)
        new_ply = jnp.where(closed, q, new_ply)
        frame_sel = (jnp.arange(D)[None, :, None] == ply_idx[:, None, None])
        status = jnp.where(
            retw_done, jnp.int8(_WIN),
            jnp.where(retf & at_root, jnp.int8(_FAIL), st.status))

        # ================= RET_FAIL =================
        retf_pop = retf & ~at_root
        new_board = unplace(new_board, retf_pop, dmq)
        new_board = unplace(new_board, retf_pop, amq)
        new_ply = jnp.where(retf_pop, q, new_ply)
        new_phase = jnp.where(retf_pop, jnp.int8(_ADV), new_phase)
        # candidate amq failed: clear parent's defender state (amq stays tried)
        qsel = (jnp.arange(D)[None, :, None] == q[:, None, None]) & retf_pop[:, None, None]
        def_opts = jnp.where(qsel, False, def_opts)
        def_tried = jnp.where(qsel, False, def_tried)
        def_move = set_col(def_move, q, retf_pop, jnp.full(bsz, -1, jnp.int32))

        # reset the abandoned frame rows (invariant: frames >= ply are clean)
        leave = (retw_pop | retf_pop)[:, None, None] & frame_sel
        att_tried = jnp.where(leave, False, att_tried)
        def_opts = jnp.where(leave, False, def_opts)
        def_tried = jnp.where(leave, False, def_tried)
        att_move = jnp.where(leave[:, :, 0], -1, att_move)

        return _State(
            board=new_board,
            ply=new_ply,
            phase=new_phase,
            att_move=att_move,
            def_move=def_move,
            att_tried=att_tried,
            def_opts=def_opts,
            def_tried=def_tried,
            threes_left=threes_left,
            tt_hash=tt_hash,
            tt_depth=tt_depth,
            tt_threes=tt_threes,
            status=status,
            win_extra=win_extra,
            win_ply=win_ply,
            steps=st.steps + 1,
        )

    final = jax.lax.while_loop(cond, body, state)

    win = final.status == _WIN
    # immediate-five wins report the five cell; otherwise the root candidate
    own5_0 = L.five_plane_of(board, rules, stm_is_circle).reshape(bsz, hw)
    imm = jnp.argmax(own5_0, -1).astype(jnp.int32)
    has_imm = jnp.any(own5_0, -1)
    first = jnp.where(has_imm, imm, final.att_move[:, 0])
    first = jnp.where(win, first, -1)
    distance = jnp.where(win, 2 * final.win_ply + final.win_extra, 0)
    return VCTBatchedResult(win=win, best_move=first, distance=distance)


class LossResult(NamedTuple):
    loss: jax.Array  # [B] bool: the side to move is PROVEN lost
    distance: jax.Array  # [B] int32 plies to mate (0 when unproven)


class LossPrepared(NamedTuple):
    child_board: jax.Array  # [B*M, H, W] defender-option children
    child_stm: jax.Array  # [B*M] attacker to move
    valid: jax.Array  # [B, M] real option lanes
    provable: jax.Array  # [B] option set is complete and fits M
    five_case: jax.Array  # [B]
    n_opts: jax.Array  # [B]
    base: jax.Array  # [B] raw mate length of the triggering execution
    # (1 five / 3 win-in-3 / 5 fork-4x3)


def prepare_loss(
    tables: V.RuleTables,
    board: jax.Array,
    stm: jax.Array,
    max_options: int = 8,
) -> LossPrepared:
    """Prove that the side to move LOSES (reference: the LOSS leg of the
    per-leaf alpha-beta — a fail-low over a COMPLETE defensive move list,
    src/search/alpha_beta/AlphaBetaSearch.cpp:91-135 with MoveGenerator's
    MUST_DEFEND stages, MoveGenerator.cpp:258-470).

    TPU-native shape: instead of recursing, ENUMERATE the complete defensive
    option set (≤ max_options cells), EXPAND the batch by that axis (the
    defender plays each option), and run the regular attacker VCT on the
    [B * max_options] children in one lockstep machine.  All options refuted
    → proven loss, distance = 1 + max(child mate distances).

    Soundness of the option sets (never claims a false loss):
    - attacker five threat(s) + defender has no own five: the ONLY moves
      that can avoid an immediate five are the completion cells themselves
      (a counter-four loses the race: the attacker completes first), so
      options = attacker five-completion cells (host analogue:
      defend_loss_in_2, move_generator.py).
    - no attacker five, defender has NO four/five makers, attacker has a
      win-in-3 cell (open-four / double-four / 4x4-fork maker): any
      defender move outside the threat's defensive-table cells loses to the
      threat's execution — the fork five-cells are distinct, and without
      counter-fours the defender can never force first (host analogue:
      defend_loss_in_4's "not has_any_four" branches).  Options = the
      defensive-table cells of ONE such threat (a complete set vs a single
      threat is complete for the position).
    - renju: a black attacker's threat cell must be ~maybe_forbidden (so the
      execution is legal); a black defender's CERTAINLY-forbidden options
      (overline / double-four line / two fours — exact, recursion-free) are
      unplayable and dropped; maybe-forbidden (3x3) options are kept and
      must be refuted like any other.
    - DEEPER loss (fork-4x3 trigger, the batched defend_loss_in_6): no
      five/win-in-3 but the attacker holds a FORK_4x3 cell and the defender
      has NO four/five makers at all (the reference's gate,
      MoveGenerator.cpp:423-447 `defend_loss_in_6` with
      n_available_fours==0).  The complete defensive set the reference
      relies on for its fail-low (must_defend => is_fully_expanded):
      defensive-table cells of the open-3 and half-open-4 directions of the
      fork, the fork cell itself, and initiative-regaining cells — cells
      within 4 steps along any direction of a half-open-4 defense where the
      defender holds ANY pattern (a SUPERSET of the reference's
      direction-matched test, which preserves completeness).  The fork's
      win may still fail (renju fake threes, hidden refutations) — then the
      child VCTs simply do not prove and no loss is claimed.
    Everything else (counter-four races, defender fives after blocks,
    renju fine print) is handled by the child VCT itself."""
    board = jnp.asarray(board)
    stm = jnp.asarray(stm)
    bsz, h, w = board.shape
    hw = h * w
    M = max_options
    rules = GameRules(tables.rules)
    renju = rules == GameRules.RENJU
    stm_is_circle = stm == CIRCLE
    att_sign = jnp.where(stm == CROSS, CIRCLE, CROSS).astype(jnp.int8)
    att_is_circle = ~stm_is_circle

    pt_cross, pt_circle = L.classify(board, rules, bitwise.THREAT_KINDS)
    att_pts = jnp.where(att_is_circle[:, None, None, None], pt_circle, pt_cross)
    def_pts = jnp.where(att_is_circle[:, None, None, None], pt_cross, pt_circle)
    empty = board == V.NONE
    att_cross = stm_is_circle[:, None, None]
    att = L.actor_planes(att_pts, empty, att_cross, renju)
    dfd = L.actor_planes(def_pts, empty, ~att_cross, renju)

    att5 = att["five"].reshape(bsz, hw)
    def5 = dfd["five"].reshape(bsz, hw)
    def_force = jnp.any(def5, -1) | jnp.any(dfd["four"], (1, 2))
    win3 = att["win3"] & ~att["maybe_forb"] if renju else att["win3"]
    win3 = win3.reshape(bsz, hw)

    five_case = jnp.any(att5, -1) & ~jnp.any(def5, -1)
    four_case = ~jnp.any(att5, -1) & ~def_force & jnp.any(win3, -1)
    # (four_case additionally requires a non-empty table lookup below — a
    # miss would silently shrink the option set, which must never happen)

    # ---- option set -------------------------------------------------------
    # five threats: the completion cells
    opts = att5
    # win-in-3 threat: defensive-table cells of the FIRST win3 cell
    rc = jnp.argmax(win3, -1).astype(jnp.int32)
    mr, mc = rc // w, rc % w
    ext = _ext_windows_at_one(board, mr, mc)  # [B, 4] pre-move windows
    pts_at_rc = L.pts_at_cell(att_pts, rc)  # [B, 4] attacker PT per dir
    dic = jnp.broadcast_to(stm_is_circle[:, None], (bsz, 4))
    dmask = jnp.zeros((bsz, 4), jnp.uint32)
    for code in (T.PT_OPEN_4, T.PT_DOUBLE_4, T.PT_HALF_OPEN_4):
        m = DEF.get_moves_batched(rules, ext, dic, code).astype(jnp.uint32)
        dmask = jnp.where(pts_at_rc == code, m, dmask)

    def table_cells(dm, mrq, mcq):
        """Defensive-table bitmasks [B, 4] at cell (mrq, mcq) -> [B, HW]."""
        steps_np = np.asarray(V.DIRECTION_STEPS, np.int32)  # [4, 2]
        offs = np.arange(DEF.EXT_LENGTH, dtype=np.int32) - DEF.CENTER  # [13]
        bit = ((dm[:, :, None] >> jnp.asarray(
            np.arange(DEF.EXT_LENGTH, dtype=np.uint32))[None, None, :]) & 1) == 1
        rr = mrq[:, None, None] + offs[None, None, :] * steps_np[None, :, 0:1]
        cc = mcq[:, None, None] + offs[None, None, :] * steps_np[None, :, 1:2]
        ok = bit & (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
        cell = jnp.clip(rr, 0, h - 1) * w + jnp.clip(cc, 0, w - 1)
        return jnp.any(
            (cell[..., None] == jnp.arange(hw, dtype=jnp.int32)) & ok[..., None],
            axis=(1, 2),
        )  # [B, HW]

    tbl_opts = table_cells(dmask, mr, mc)
    # the threat cell itself always defends (occupying it kills the move)
    tbl_opts = tbl_opts | (rc[:, None] == jnp.arange(hw, dtype=jnp.int32))
    four_case = four_case & jnp.any(dmask != 0, -1)

    # ---- deeper trigger: attacker FORK_4x3, four-less defender ------------
    # (the batched defend_loss_in_6, MoveGenerator.cpp:423-447; see the
    # soundness note in the docstring)
    att_tt = V.threat_type(
        tables, att_pts,
        jnp.broadcast_to(att_is_circle[:, None, None], (bsz, h, w)),
    )
    fork43 = (att_tt == T.TT_FORK_4x3) & empty
    if renju:
        fork43 = fork43 & ~att["certain_forb"]
    fork43_flat = fork43.reshape(bsz, hw)
    fork_case = (
        ~jnp.any(att5, -1) & ~def_force & ~four_case & jnp.any(fork43_flat, -1)
    )
    rc3 = jnp.argmax(fork43_flat, -1).astype(jnp.int32)
    mr3, mc3 = rc3 // w, rc3 % w
    ext3 = _ext_windows_at_one(board, mr3, mc3)
    pts3 = L.pts_at_cell(att_pts, rc3)  # [B, 4]
    dmask3 = jnp.zeros((bsz, 4), jnp.uint32)
    ho4mask3 = jnp.zeros((bsz, 4), jnp.uint32)
    for code in (T.PT_OPEN_3, T.PT_HALF_OPEN_4):
        m = DEF.get_moves_batched(rules, ext3, dic, code).astype(jnp.uint32)
        dmask3 = jnp.where(pts3 == code, m, dmask3)
        if code == T.PT_HALF_OPEN_4:
            ho4mask3 = jnp.where(pts3 == code, m, ho4mask3)
    tbl3 = table_cells(dmask3, mr3, mc3)
    ho4def = table_cells(ho4mask3, mr3, mc3).reshape(bsz, h, w)
    # initiative-regaining superset: within 4 steps along any direction of
    # a half-open-4 defense, any cell where the defender holds a pattern
    pad4 = jnp.pad(ho4def, ((0, 0), (4, 4), (4, 4)))
    near = jnp.zeros_like(ho4def)
    for dr, dc in V.DIRECTION_STEPS:
        for i in range(-4, 5):
            if i == 0:
                continue
            near = near | pad4[
                :, 4 + i * dr : 4 + i * dr + h, 4 + i * dc : 4 + i * dc + w
            ]
    def_any = (def_pts > 0).any(-1)  # [B, H, W]
    init_cells = (near & def_any & empty).reshape(bsz, hw)
    opts3 = tbl3 | (rc3[:, None] == jnp.arange(hw, dtype=jnp.int32)) | init_cells
    fork_case = fork_case & jnp.any(dmask3 != 0, -1)

    opts = jnp.where(
        five_case[:, None], opts,
        jnp.where(four_case[:, None], tbl_opts,
                  jnp.where(fork_case[:, None], opts3, False)))
    opts = opts & empty.reshape(bsz, hw)
    if renju:
        # black defender: certainly-forbidden cells are unplayable
        opts = opts & ~jnp.where(
            (~stm_is_circle)[:, None], dfd["certain_forb"].reshape(bsz, hw),
            False,
        )
    n_opts = opts.sum(-1)
    provable = (five_case | four_case | fork_case) & (n_opts <= M)
    base = jnp.where(
        five_case, 1, jnp.where(four_case, 3, 5)
    ).astype(jnp.int32)  # raw mate length of the triggering execution

    # ---- expand the batch by the option axis and run the attacker VCT -----
    opt_idx = jax.lax.top_k(opts.astype(jnp.int32)
                            * (hw - jnp.arange(hw, dtype=jnp.int32))
                            + opts.astype(jnp.int32), M)[1]  # [B, M]
    oh_opt = (opt_idx[..., None]
              == jnp.arange(hw, dtype=jnp.int32)[None, None, :])  # [B, M, HW]
    valid = (oh_opt & opts[:, None, :]).any(-1) & provable[:, None]
    child = jnp.where(
        (oh_opt & valid[..., None]).reshape(bsz, M, h, w),
        jnp.broadcast_to(stm[:, None, None, None], (bsz, M, h, w)),
        board[:, None],
    ).reshape(bsz * M, h, w)
    child_stm = jnp.broadcast_to(att_sign[:, None], (bsz, M)).reshape(-1)
    return LossPrepared(
        child_board=child, child_stm=child_stm, valid=valid,
        provable=provable, five_case=five_case, n_opts=n_opts, base=base,
    )


def finish_loss(prep: LossPrepared, cwin: jax.Array, cdist: jax.Array) -> LossResult:
    """Combine the children's VCT verdicts ([B, M] win/distance) into the
    loss proof: all real options refuted -> the side to move is lost."""
    valid, provable = prep.valid, prep.provable
    n_opts, base = prep.n_opts, prep.base
    refuted_all = (cwin | ~valid).all(-1)
    loss = provable & refuted_all
    worst = jnp.where(valid & cwin, cdist, base[:, None]).max(-1)
    distance = jnp.where(loss, 1 + jnp.where(n_opts > 0, worst, base), 0)
    return LossResult(loss=loss, distance=distance.astype(jnp.int32))


def _attacker_move_plane(
    tables: V.RuleTables, board: jax.Array, stm: jax.Array
) -> jax.Array:
    """[B, HW] weighted candidate plane for the side TO MOVE acting as the
    attacker in the loss recursion: fork-4x3 makers (8), win-in-3 makers
    (4), four makers (2) — the THREATS-mode initiative moves of the
    reference's recursive_solve (MoveGenerator.cpp THREATS stages).
    Completeness is NOT required here (this is the existential side of the
    fail-low: one working attacker move suffices); a black attacker's
    maybe-forbidden cells are dropped so every candidate is a legal move."""
    board = jnp.asarray(board)
    stm = jnp.asarray(stm)
    bsz, h, w = board.shape
    rules = GameRules(tables.rules)
    renju = rules == GameRules.RENJU
    stm_is_circle = stm == CIRCLE
    pt_cross, pt_circle = L.classify(board, rules, bitwise.THREAT_KINDS)
    my_pts = jnp.where(stm_is_circle[:, None, None, None], pt_circle, pt_cross)
    empty = board == V.NONE
    mine = L.actor_planes(my_pts, empty, (~stm_is_circle)[:, None, None], renju)
    my_tt = V.threat_type(
        tables, my_pts,
        jnp.broadcast_to(stm_is_circle[:, None, None], (bsz, h, w)),
    )
    fork43 = (my_tt == T.TT_FORK_4x3) & empty
    win3 = mine["win3"]
    four = mine["four"]
    if renju:
        legal = ~mine["maybe_forb"]
        fork43, win3, four = fork43 & legal, win3 & legal, four & legal
    weight = (
        8 * fork43.astype(jnp.int32)
        + 4 * win3.astype(jnp.int32)
        + 2 * four.astype(jnp.int32)
    ) * empty.astype(jnp.int32)
    return weight.reshape(bsz, h * w)


def solve_loss(
    tables: V.RuleTables,
    board: jax.Array,
    stm: jax.Array,
    max_options: int = 8,
    max_depth: int = 8,
    max_steps: int = 384,
    max_threes: int = 2,
    levels: int = 1,
    max_att_moves: int = 4,
) -> LossResult:
    """prepare_loss + attacker VCT on the option children + finish_loss
    (one call for standalone use; the MCTS leaf solver instead CONCATENATES
    the prepared children into its win-solve lockstep batch).

    `levels` > 1 adds the reference's arbitrary-depth fail-low recursion
    (AlphaBetaSearch::recursive_solve — a node is lost when EVERY move of a
    complete defensive list fails low, at any reached depth,
    AlphaBetaSearch.cpp:91-135) in batched form: a defender option the
    direct VCT could NOT refute is re-attacked by expanding up to
    `max_att_moves` attacker initiative moves (fork/win3/four makers) and
    recursing into `solve_loss(levels - 1)` on each resulting position —
    the option is refuted iff SOME attacker move leaves the defender in a
    proven loss.  Defender option sets stay complete at every level
    (prepare_loss), so soundness is preserved; the attacker side is
    existential and needs no completeness.  Batch cost multiplies by
    `max_options * max_att_moves` per extra level — use levels=2 for
    analysis/goldens, keep the MCTS leaf prover at levels=1."""
    prep = prepare_loss(tables, board, stm, max_options)
    bsz = prep.valid.shape[0]
    M = prep.valid.shape[1]
    sres = solve(
        tables, prep.child_board, prep.child_stm,
        max_depth=max_depth, max_steps=max_steps, max_threes=max_threes,
    )
    cwin = sres.win.reshape(bsz, M)
    cdist = sres.distance.reshape(bsz, M)
    if levels > 1:
        A = max_att_moves
        cb, cs = prep.child_board, prep.child_stm  # [B*M, H, W], [B*M]
        h, w = cb.shape[1], cb.shape[2]
        hw = h * w
        wplane = _attacker_move_plane(tables, cb, cs)  # [B*M, HW]
        topv, topi = jax.lax.top_k(wplane, A)
        cand_valid = topv > 0  # [B*M, A]
        oh = (
            topi[..., None] == jnp.arange(hw, dtype=jnp.int32)[None, None, :]
        ).reshape(bsz * M, A, h, w)
        gboard = jnp.where(
            oh & cand_valid[..., None, None],
            jnp.broadcast_to(cs[:, None, None, None], (bsz * M, A, h, w)),
            cb[:, None],
        ).reshape(bsz * M * A, h, w)
        gstm = jnp.broadcast_to(
            jnp.where(cs == CROSS, CIRCLE, CROSS).astype(jnp.int8)[:, None],
            (bsz * M, A),
        ).reshape(-1)
        sub = solve_loss(
            tables, gboard, gstm, max_options=max_options,
            max_depth=max_depth, max_steps=max_steps, max_threes=max_threes,
            levels=levels - 1, max_att_moves=max_att_moves,
        )
        gloss = sub.loss.reshape(bsz, M, A) & cand_valid.reshape(bsz, M, A)
        gdist = sub.distance.reshape(bsz, M, A)
        # the attacker picks the SHORTEST winning continuation; the child's
        # mate distance adds the attacker's own move
        d2 = jnp.where(gloss, gdist, jnp.int32(1 << 20)).min(-1) + 1
        win2 = gloss.any(-1)
        upd = ~cwin & win2
        cdist = jnp.where(upd, d2, cdist)
        cwin = cwin | win2
    return finish_loss(prep, cwin, cdist)
