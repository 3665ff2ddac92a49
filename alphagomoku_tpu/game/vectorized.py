"""Batched, jit-compatible game rules: the TPU-native rules engine.

Everything here operates on `[B, H, W]` int8 boards in lockstep and is pure
(tables passed explicitly), so it composes under `jit`, `vmap`, `lax.scan`
and `shard_map`.  Semantics match `game.rules` (the exact host engine), which
itself is verified bit-for-bit against the reference; parity between the two
is covered by random-rollout cross-checks in tests/test_vectorized_rules.py.

Design notes (TPU-first):
- window extraction at query cells = 40 gathers on the padded board
  (4 directions x 10 off-center cells), vectorized over arbitrary query
  shapes `[B, *S]`; extraction for ALL cells = 40 static shifted slices
  accumulated into a packed `[B, 4, H, W]` uint32 tensor — gather-free.
- pattern/threat classification = `take` lookups into precomputed tables
  (1 MB + 4 KB per rule variant, resident in HBM).
- renju fake-open-three resolution is recursive in the reference
  (src/game/rules.cpp:134-173: each level hypothetically places one stone).
  Board copies would force `[B*40^depth, H, W]` materialization, so instead
  hypothetical stones ride along as an *overlay* (per-query list of cross
  stones patched into gathered windows), and each recursion level is ONE
  batched call over a query axis widened x40 — the compiled graph stays tiny
  and the work is pure vector math.  Depth is bounded (default 2 extra
  plies); deeper positions are pathological compositions, and the exact
  unbounded engine in `game.rules` covers host-side queries.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .types import (
    NONE,
    CROSS,
    CIRCLE,
    ILLEGAL,
    DIRECTION_STEPS,
    GameRules,
    GameOutcome,
)
from ..patterns import tables as T

PAD = T.CENTER  # 5


class RuleTables(NamedTuple):
    """Device-resident lookup tables for one rule variant."""

    pattern: jax.Array  # uint8[4^10], cross nibble | circle nibble << 4
    threat: jax.Array  # uint8[8^4]
    rules: int  # static python int (GameRules)


@functools.lru_cache(maxsize=None)
def device_tables(rules: GameRules) -> RuleTables:
    pattern, threat = T.get_tables(rules)
    return RuleTables(
        pattern=jnp.asarray(pattern), threat=jnp.asarray(threat), rules=int(rules)
    )


def pad_board(board: jax.Array) -> jax.Array:
    """[B, H, W] -> [B, H+10, W+10] padded with ILLEGAL."""
    return jnp.pad(board, ((0, 0), (PAD, PAD), (PAD, PAD)), constant_values=ILLEGAL)


def _bidx(board: jax.Array, query_shape) -> jax.Array:
    """Batch index array broadcastable to a [B, *S] query shape."""
    b = jnp.arange(board.shape[0])
    return b.reshape((-1,) + (1,) * (len(query_shape) - 1))


def windows_at(
    board: jax.Array,
    rows: jax.Array,
    cols: jax.Array,
    overlay_rows: jax.Array | None = None,
    overlay_cols: jax.Array | None = None,
) -> jax.Array:
    """Packed 22-bit 11-cell windows around query cells.

    board: [B, H, W] int8; rows/cols: [B, *S] -> [B, *S, 4] uint32 with the
    center masked to NONE (pattern keys require an empty center; reference:
    RawPatternCalculator::getPatternsAt).

    overlay_rows/cols: optional [B, *S, K] hypothetical CROSS stones patched
    into the gathered cells (renju fake-three recursion; see module doc).
    """
    p = pad_board(board)
    b = _bidx(board, rows.shape)
    wins = []
    for dr, dc in DIRECTION_STEPS:
        acc = jnp.zeros(rows.shape, jnp.uint32)
        for i in range(-PAD, PAD + 1):
            if i == 0:
                continue  # center always reads NONE
            r, c = rows + i * dr, cols + i * dc
            cell = p[b, r + PAD, c + PAD].astype(jnp.uint32)
            if overlay_rows is not None:
                hit = jnp.any(
                    (overlay_rows == r[..., None]) & (overlay_cols == c[..., None]),
                    axis=-1,
                )
                cell = jnp.where(hit, np.uint32(CROSS), cell)
            acc = acc | (cell << np.uint32(2 * (i + PAD)))
        wins.append(acc)
    return jnp.stack(wins, axis=-1)


def windows_at_one(board: jax.Array, rows: jax.Array, cols: jax.Array) -> jax.Array:
    """Packed windows for ONE query cell per board: [B, H, W] + [B] -> [B, 4].

    Gather-free: computes all windows (cheap fused shifts) and reduces with a
    one-hot plane — per-batch-row gathers serialize on TPU, a masked reduce
    streams.  Equivalent to windows_at(board, rows[:, None], cols[:, None])
    squeezed, for in-bounds queries."""
    bsz, h, w = board.shape
    wins = windows_all(board)  # [B, 4, H, W]
    mask = (
        (jnp.arange(h, dtype=jnp.int32)[None, :, None] == rows[:, None, None])
        & (jnp.arange(w, dtype=jnp.int32)[None, None, :] == cols[:, None, None])
    )[:, None, :, :]
    return jnp.where(mask, wins, jnp.uint32(0)).sum((2, 3), dtype=jnp.uint32)


def windows_at_many(board: jax.Array, rows: jax.Array, cols: jax.Array) -> jax.Array:
    """Packed windows for Q query cells per board: [B, H, W] + [B, Q] ->
    [B, Q, 4] via a one-hot masked reduce (gather-free; see windows_at_one).
    Out-of-range queries (clipped by the caller) return whatever cell they
    alias — callers mask validity themselves, as with windows_at."""
    bsz, h, w = board.shape
    wins = windows_all(board).reshape(bsz, 4, h * w)  # [B, 4, HW]
    flat = rows * w + cols  # [B, Q]
    onehot = flat[:, :, None] == jnp.arange(h * w, dtype=jnp.int32)[None, None, :]
    sel = jnp.where(onehot[:, :, None, :], wins[:, None, :, :], jnp.uint32(0))
    return sel.sum(-1, dtype=jnp.uint32)  # [B, Q, 4]


def windows_at_sel(
    board: jax.Array,
    rows: jax.Array,
    cols: jax.Array,
    overlay_rows: jax.Array | None = None,
    overlay_cols: jax.Array | None = None,
) -> jax.Array:
    """Gather-free windows_at: packed windows for query cells [B, *S] ->
    [B, *S, 4], with optional hypothetical CROSS overlays [B, *S, K].

    Base windows come from windows_all via an exact one-hot einsum (u32
    split into bf16-safe bytes); overlay stones are then patched in with
    pure bit arithmetic — a stone at offset i along a window's direction
    replaces that window's 2-bit cell.  Per-batch-row gathers serialize on
    TPU; this path is all streaming + MXU work, equivalent to windows_at
    for in-bounds queries."""
    bsz, h, w = board.shape
    qshape = rows.shape[1:]
    q = int(np.prod(qshape)) if qshape else 1
    rq = rows.reshape(bsz, q)
    cq = cols.reshape(bsz, q)

    wins_flat = windows_all(board).reshape(bsz, 4, h * w)  # [B, 4, HW]
    onehot = (
        (rq * w + cq)[:, :, None] == jnp.arange(h * w, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.bfloat16)  # [B, Q, HW]
    # 22-bit windows split into three bf16-exact bytes, selected in ONE
    # einsum (per-byte passes re-materialize the one-hot and triple traffic)
    bytes_flat = jnp.concatenate(
        [
            ((wins_flat >> np.uint32(shift)) & U32_FF).astype(jnp.float32)
            for shift in (0, 8, 16)
        ],
        axis=1,
    )  # [B, 12, HW]
    sel = jnp.einsum("bqm,bcm->bqc", onehot, bytes_flat)  # [B, Q, 12]
    selu = jnp.round(sel).astype(jnp.uint32).reshape(bsz, q, 3, 4)
    acc = (
        selu[:, :, 0, :]
        | (selu[:, :, 1, :] << np.uint32(8))
        | (selu[:, :, 2, :] << np.uint32(16))
    )

    if overlay_rows is not None:
        ovr = overlay_rows.reshape(bsz, q, -1)
        ovc = overlay_cols.reshape(bsz, q, -1)
        dr_all = ovr - rq[:, :, None]  # [B, Q, K]
        dc_all = ovc - cq[:, :, None]
        for d, (dr, dc) in enumerate(DIRECTION_STEPS):
            # offset of the overlay stone along this direction, if aligned
            if dr == 0:  # horizontal
                i = dc_all
                aligned = dr_all == 0
            elif dc == 0:  # vertical
                i = dr_all
                aligned = dc_all == 0
            else:  # diagonals: cell = (r + i*dr, c + i*dc)
                i = dr_all
                aligned = dc_all == dr_all * dc
            ok = aligned & (i >= -PAD) & (i <= PAD) & (i != 0)
            pos = jnp.clip(i + PAD, 0, 2 * PAD).astype(jnp.uint32)
            clear = jnp.where(ok, U32_3 << (2 * pos), np.uint32(0))
            setc = jnp.where(ok, np.uint32(CROSS) << (2 * pos), np.uint32(0))
            # fold all K overlays into one clear/set mask
            clear = jax.lax.reduce(
                clear, np.uint32(0), jax.lax.bitwise_or, dimensions=(2,)
            )
            setc = jax.lax.reduce(
                setc, np.uint32(0), jax.lax.bitwise_or, dimensions=(2,)
            )
            acc = acc.at[:, :, d].set((acc[:, :, d] & ~clear) | setc)
    return acc.reshape((bsz,) + qshape + (4,))


U32_FF = np.uint32(0xFF)
U32_3 = np.uint32(3)


def windows_all(board: jax.Array) -> jax.Array:
    """Packed 22-bit windows for EVERY cell: [B, H, W] -> [B, 4, H, W] uint32.

    Gather-free: 40 shifted static slices of the padded board."""
    bsz, h, w = board.shape
    p = pad_board(board).astype(jnp.uint32)
    out = []
    for dr, dc in DIRECTION_STEPS:
        acc = jnp.zeros((bsz, h, w), jnp.uint32)
        for i in range(-PAD, PAD + 1):
            if i == 0:
                continue
            sl = p[:, PAD + i * dr : PAD + i * dr + h, PAD + i * dc : PAD + i * dc + w]
            acc = acc | (sl << np.uint32(2 * (i + PAD)))
        out.append(acc)
    return jnp.stack(out, axis=1)


def narrow_down(windows: jax.Array) -> jax.Array:
    """22-bit window -> 20-bit table key (drop the empty-center bits)."""
    return (windows & np.uint32(1023)) | ((windows & np.uint32(4190208)) >> np.uint32(2))


def pattern_types(tables: RuleTables, windows: jax.Array, sign_is_circle) -> jax.Array:
    """PatternType per direction; `windows` [..., 4], `sign_is_circle` bool
    broadcastable to [...]."""
    enc = jnp.take(tables.pattern, narrow_down(windows).astype(jnp.int32)).astype(jnp.int32)
    shift = jnp.where(sign_is_circle, 4, 0)
    return (enc >> jnp.asarray(shift)[..., None]) & 15


def threat_type(tables: RuleTables, pts: jax.Array, sign_is_circle) -> jax.Array:
    """Combine 4 directional PatternTypes (last axis) into a ThreatType."""
    idx = pts[..., 0] | (pts[..., 1] << 3) | (pts[..., 2] << 6) | (pts[..., 3] << 9)
    enc = jnp.take(tables.threat, idx).astype(jnp.int32)
    return (enc >> jnp.where(sign_is_circle, 4, 0)) & 15


def promotion_masks(windows: jax.Array) -> jax.Array:
    """Vectorized open-three promotion-move lookup (cross attacker): first of
    12 masked compares on packed windows -> 11-bit spot masks
    (reference data: src/patterns/DefensiveMoveTable.cpp:329-341)."""
    out = jnp.zeros(windows.shape, jnp.uint32)
    decided = jnp.zeros(windows.shape, bool)
    for pat, msk, res in zip(T._PROMO_PATTERNS, T._PROMO_MASKS, T._PROMO_RESULTS):
        hit = (~decided) & ((windows & np.uint32(msk)) == np.uint32(pat))
        out = jnp.where(hit, np.uint32(res), out)
        decided = decided | hit
    return out


def _straight_four(windows: jax.Array) -> jax.Array:
    """Any 4 consecutive crosses in center-filled windows [..., 4] -> [..., 4]
    per direction (reference: RawPatternCalculator::isStraightFourAt — just a
    4-in-a-row scan; candidates come pre-filtered)."""
    wins = windows | (np.uint32(CROSS) << np.uint32(2 * T.CENTER))
    hit = jnp.zeros(wins.shape, bool)
    for start in range(T.PATTERN_LENGTH - 3):
        hit = hit | (((wins >> np.uint32(2 * start)) & np.uint32(255)) == np.uint32(0b01010101))
    return hit


def is_forbidden(
    tables: RuleTables,
    board: jax.Array,
    rows: jax.Array,
    cols: jax.Array,
    depth: int = 2,
    overlay_rows: jax.Array | None = None,
    overlay_cols: jax.Array | None = None,
    max_forks: int | None = 8,
) -> jax.Array:
    """Batched renju forbidden check for BLACK moves at query cells.

    rows/cols: [B, *S] -> bool [B, *S].  Thin wrapper over
    :func:`is_forbidden_u` discarding the uncertainty flag; see there for
    semantics."""
    return is_forbidden_u(
        tables, board, rows, cols, depth, overlay_rows, overlay_cols, max_forks
    )[0]


def is_forbidden_u(
    tables: RuleTables,
    board: jax.Array,
    rows: jax.Array,
    cols: jax.Array,
    depth: int = 2,
    overlay_rows: jax.Array | None = None,
    overlay_cols: jax.Array | None = None,
    max_forks: int | None = 8,
) -> tuple[jax.Array, jax.Array]:
    """Batched renju forbidden check with an exactness certificate.

    rows/cols: [B, *S] -> (forbidden, uncertain), both bool [B, *S].  The
    query cell may be empty or occupied (windows mask the center).
    Re-expression of reference src/game/rules.cpp:134-173 with recursion
    depth bounded by `depth` — but unlike the reference's unbounded
    recursion, every place the bound could change the answer is TRACKED:

    - `uncertain=False` certifies `forbidden` equals the exact
      unbounded-recursion verdict (host rules.is_forbidden).
    - `uncertain=True` cells return the UPPER bound (forbidden if any
      resolution of the uncertain sub-checks could make it forbidden) —
      the conservative direction the old naive fallback used.

    Internally each level computes a three-valued verdict: a nested
    fake-three check at depth 0 returns its naive answer flagged uncertain
    when the cell is a naive 3x3 fork; a resolve level derives per-direction
    "certainly real" / "possibly real" three statuses from the children's
    (verdict, uncertain) pairs and flags the cell iff the low and high
    threat bounds disagree.  Escalation passes (forbidden_plane_u /
    outcome_after) re-resolve flagged cells at greater depth; a zero
    residual certifies exact parity.

    `max_forks` caps how many naive-FORK_3x3 query cells per board get the
    full fake-three resolution when the query axis is wide (the recursion
    widens each query x16 per level; resolving every cell materializes
    multi-GB one-hot selects at the deepest level).  Fork cells are rare —
    compacting to the live ones keeps the math exact unless a single board
    has more than `max_forks` simultaneous fork queries; overflow cells
    return the naive answer flagged uncertain.
    """
    from ..patterns import bitwise  # deferred: avoids import cycle at load

    board = jnp.asarray(board)
    rows, cols = jnp.asarray(rows), jnp.asarray(cols)
    h, w = board.shape[1], board.shape[2]
    qshape = rows.shape
    not_circle = jnp.zeros(qshape, bool)

    windows = windows_at_sel(board, rows, cols, overlay_rows, overlay_cols)
    # gather-free classification: a take into the 1M-entry pattern table
    # serializes per batch row on TPU; the compiled bit-math classifier is
    # pure VPU work (the unused circle side is dead-code-eliminated)
    pts, _ = bitwise.classify(windows, GameRules(tables.rules))
    threat = threat_type(tables, pts, not_circle)
    naive = (
        (threat == T.TT_OVERLINE) | (threat == T.TT_FORK_4x4) | (threat == T.TT_FORK_3x3)
    )
    is_fork = threat == T.TT_FORK_3x3
    if depth <= 0:
        # naive non-forbidden is exact (resolution only ever demotes threes);
        # a naive 3x3 fork could resolve to fake -> uncertain
        return naive, is_fork

    bsz = board.shape[0]
    q_total = int(np.prod(qshape[1:])) if len(qshape) > 1 else 1
    # compaction pays for itself only when the x16 widening below would be
    # large; for narrow queries the top_k/scatter overhead exceeds the save
    if max_forks is not None and q_total > 4 * max_forks:
        # compact: resolve only the (rare) fork cells, at most max_forks per
        # board, then scatter the verdicts back over the naive answer
        rows_f = rows.reshape(bsz, q_total)
        cols_f = cols.reshape(bsz, q_total)
        fork_f = is_fork.reshape(bsz, q_total)
        naive_f = naive.reshape(bsz, q_total)

        def resolve_compacted(_):
            vals, idx = jax.lax.top_k(fork_f.astype(jnp.int32), max_forks)
            sub_r = jnp.take_along_axis(rows_f, idx, 1)  # [B, F]
            sub_c = jnp.take_along_axis(cols_f, idx, 1)
            if overlay_rows is not None:
                kov = overlay_rows.shape[-1]
                ov_rf = overlay_rows.reshape(bsz, q_total, kov)
                ov_cf = overlay_cols.reshape(bsz, q_total, kov)
                sub_ovr = jnp.take_along_axis(ov_rf, idx[:, :, None], 1)
                sub_ovc = jnp.take_along_axis(ov_cf, idx[:, :, None], 1)
            else:
                sub_ovr = sub_ovc = None
            sub_forb, sub_unc = is_forbidden_u(
                tables, board, sub_r, sub_c, depth, sub_ovr, sub_ovc,
                max_forks=None,
            )  # [B, F]
            valid = vals > 0
            onehot = idx[:, :, None] == jnp.arange(q_total, dtype=jnp.int32)[None, None, :]
            resolved_true = ((sub_forb & valid)[:, :, None] & onehot).any(1)
            unc_true = ((sub_unc & valid)[:, :, None] & onehot).any(1)
            covered = (valid[:, :, None] & onehot).any(1)
            # unselected fork cells (overflow past max_forks) keep naive,
            # flagged uncertain
            forb = (naive_f & ~fork_f) | resolved_true | (fork_f & ~covered)
            unc = unc_true | (fork_f & ~covered)
            return forb, unc

        out_f, unc_f = jax.lax.cond(
            jnp.any(fork_f),
            resolve_compacted,
            lambda _: (naive_f, jnp.zeros_like(naive_f)),
            operand=None,
        )
        return out_f.reshape(qshape), unc_f.reshape(qshape)

    def resolve(_):
        # enumerate the (direction, offset) promotion spots, then COMPACT to
        # the at-most-16 live candidates before widening the query axis: an
        # open three promotes on <= 3 spots per direction, so 16 covers every
        # true candidate, and the compaction keeps the recursion's gather
        # footprint ~6x smaller (the full 40-wide form built kernels large
        # enough to fault the TPU at batch >= 1024)
        promo = promotion_masks(windows)  # [B,*S,4]
        cand_r, cand_c, cand_ok, cand_dir = [], [], [], []
        offsets = [i for i in range(-PAD, PAD + 1) if i != 0]
        for d, (dr, dc) in enumerate(DIRECTION_STEPS):
            for i in offsets:
                r2, c2 = rows + i * dr, cols + i * dc
                bit = ((promo[..., d] >> np.uint32(PAD + i)) & 1) == 1
                inb = (r2 >= 0) & (r2 < h) & (c2 >= 0) & (c2 < w)
                cand_r.append(jnp.clip(r2, 0, h - 1))
                cand_c.append(jnp.clip(c2, 0, w - 1))
                cand_ok.append(bit & inb)
                cand_dir.append(d)
        rr = jnp.stack(cand_r, axis=-1)  # [B,*S,40]
        cc = jnp.stack(cand_c, axis=-1)
        ok = jnp.stack(cand_ok, axis=-1)
        dir_full = jnp.asarray(cand_dir, jnp.int32)

        CAND = 16
        _, top_idx = jax.lax.top_k(ok.astype(jnp.int32), CAND)  # true ones first
        rr = jnp.take_along_axis(rr, top_idx, -1)  # [B,*S,16]
        cc = jnp.take_along_axis(cc, top_idx, -1)
        ok = jnp.take_along_axis(ok, top_idx, -1)
        dirs = dir_full[top_idx]

        # hypothetical stone at the fork cell rides along as overlay
        if overlay_rows is None:
            ov_r = rows[..., None, None]  # [B,*S,1] -> broadcast over cand axis
            ov_c = cols[..., None, None]
            ov_r40 = jnp.broadcast_to(ov_r, rr.shape + (1,))
            ov_c40 = jnp.broadcast_to(ov_c, cc.shape + (1,))
        else:
            prev_r = jnp.broadcast_to(
                overlay_rows[..., None, :], rr.shape + (overlay_rows.shape[-1],)
            )
            prev_c = jnp.broadcast_to(
                overlay_cols[..., None, :], cc.shape + (overlay_cols.shape[-1],)
            )
            ov_r40 = jnp.concatenate(
                [prev_r, jnp.broadcast_to(rows[..., None, None], rr.shape + (1,))], -1
            )
            ov_c40 = jnp.concatenate(
                [prev_c, jnp.broadcast_to(cols[..., None, None], cc.shape + (1,))], -1
            )

        # candidate spot must be empty on the overlaid board
        b = _bidx(board, rr.shape)
        base_cell = board[b, rr, cc]
        on_overlay = jnp.any((ov_r40 == rr[..., None]) & (ov_c40 == cc[..., None]), -1)
        empty = (base_cell == NONE) & ~on_overlay

        cand_wins = windows_at_sel(board, rr, cc, ov_r40, ov_c40)  # [B,*S,16,4]
        sf_all = _straight_four(cand_wins)  # [B,*S,16,4]
        sf = jnp.take_along_axis(sf_all, dirs[..., None], -1)[..., 0]
        nested, nested_unc = is_forbidden_u(
            tables, board, rr, cc, depth - 1, ov_r40, ov_c40
        )
        # three-valued candidate status from the child's (verdict, unc) pair:
        # nested verdict is the child's UPPER bound, so ~nested == "certainly
        # not forbidden" and (~nested | nested_unc) == "possibly not forbidden"
        promotes = ok & empty & sf  # [B,*S,16]
        certain_good = promotes & ~nested
        maybe_good = promotes & (~nested | nested_unc)

        certain_real = jnp.stack(
            [(certain_good & (dirs == d)).any(-1) for d in range(4)], -1
        )  # [B,*S,4]
        maybe_real = jnp.stack(
            [(maybe_good & (dirs == d)).any(-1) for d in range(4)], -1
        )
        open3 = pts == T.PT_OPEN_3
        # low bound demotes every not-certainly-real three; high bound keeps
        # every possibly-real three.  Forbidden-ness is monotone in the number
        # of surviving threes, so the true verdict lies between the bounds.
        pts_low = jnp.where(open3 & ~certain_real, 0, pts)
        pts_high = jnp.where(open3 & ~maybe_real, 0, pts)
        t_low = threat_type(tables, pts_low, not_circle)
        t_high = threat_type(tables, pts_high, not_circle)

        def _forb(t):
            return (t == T.TT_OVERLINE) | (t == T.TT_FORK_4x4) | (t == T.TT_FORK_3x3)

        f_low, f_high = _forb(t_low), _forb(t_high)
        return f_high, f_low != f_high

    resolved, res_unc = jax.lax.cond(
        jnp.any(is_fork),
        resolve,
        lambda _: (naive, jnp.zeros_like(naive)),
        operand=None,
    )
    return jnp.where(is_fork, resolved, naive), is_fork & res_unc


def outcome_after(
    tables: RuleTables,
    board: jax.Array,
    rows: jax.Array,
    cols: jax.Array,
    signs: jax.Array,
    move_count: jax.Array,
    draw_after: int,
    forbidden_depth: int = 2,
) -> jax.Array:
    """GameOutcome [B] after `signs` played at (rows, cols); `board` must
    already contain the move (reference: src/game/rules.cpp:110-133).
    `move_count` counts stones including this move."""
    bsz = board.shape[0]
    is_circle = signs == CIRCLE
    windows = windows_at_one(board, rows, cols)
    # five-only compiled bit math: the pattern_types table read is a
    # serialized gather (measured 3.2 ms at batch 1280 — the single
    # largest cost in the MCTS step's terminal check)
    from ..patterns import bitwise as _bw

    fx, fo = _bw.five_mask(windows, GameRules(tables.rules))
    five = jnp.any(jnp.where(is_circle[:, None], fo, fx), axis=-1)
    win = jnp.where(is_circle, int(GameOutcome.CIRCLE_WIN), int(GameOutcome.CROSS_WIN))

    out = jnp.full(bsz, int(GameOutcome.UNKNOWN), jnp.int8)
    draw = move_count >= draw_after
    out = jnp.where(draw, np.int8(GameOutcome.DRAW), out)
    if tables.rules == GameRules.RENJU:

        def with_forbidden(_):
            forb, unc = is_forbidden_u(tables, board, rows, cols, forbidden_depth)
            # escalate the (rare) boards whose bounded check was not certain:
            # recheck up to 8 of them at depth 3 (cond-gated, ~never fires)
            unc = unc & ~is_circle & ~five

            def escalate(_):
                K = min(8, bsz)
                vals, bidx = jax.lax.top_k(unc.astype(jnp.int32), K)
                gboards = _gather_boards(board, bidx)
                onehot = (
                    bidx[:, None] == jnp.arange(bsz, dtype=jnp.int32)[None, :]
                ).astype(jnp.int32)
                gr = (onehot * rows[None, :].astype(jnp.int32)).sum(1)
                gc = (onehot * cols[None, :].astype(jnp.int32)).sum(1)
                f2, _u2 = is_forbidden_u(
                    tables, gboards, gr[:, None], gc[:, None],
                    forbidden_depth + 1, max_forks=None,
                )
                f2 = f2[:, 0] & (vals > 0)
                eye = bidx[:, None] == jnp.arange(bsz)[None, :]
                res = (eye & f2[:, None]).any(0)
                covered = (eye & (vals > 0)[:, None]).any(0)
                return jnp.where(covered & unc, res, forb)

            forb = jax.lax.cond(jnp.any(unc), escalate, lambda _: forb, operand=None)
            return jnp.where(
                forb & ~is_circle & ~five, np.int8(int(GameOutcome.CIRCLE_WIN)), out
            )

        out = jax.lax.cond(
            jnp.any(~is_circle), with_forbidden, lambda _: out, operand=None
        )
    out = jnp.where(five, win.astype(jnp.int8), out)
    return out


# ---------------------------------------------------------------------------
# Lockstep vectorized environment
# ---------------------------------------------------------------------------


class EnvState(NamedTuple):
    """Lockstep env state over a batch of independent games."""

    board: jax.Array  # [B, H, W] int8
    to_move: jax.Array  # [B] int8 (CROSS or CIRCLE)
    outcome: jax.Array  # [B] int8 GameOutcome
    move_count: jax.Array  # [B] int32


def env_reset(batch: int, rows: int, cols: int) -> EnvState:
    return EnvState(
        board=jnp.zeros((batch, rows, cols), jnp.int8),
        to_move=jnp.full(batch, CROSS, jnp.int8),
        outcome=jnp.full(batch, int(GameOutcome.UNKNOWN), jnp.int8),
        move_count=jnp.zeros(batch, jnp.int32),
    )


def legal_mask(state: EnvState) -> jax.Array:
    """[B, H, W] bool: playable cells (empty + game still running).

    Renju forbidden cells remain playable (playing one loses), matching the
    reference's move legality (Board::isMoveLegal)."""
    active = (state.outcome == int(GameOutcome.UNKNOWN))[:, None, None]
    return (state.board == NONE) & active


def env_step(
    tables: RuleTables,
    state: EnvState,
    rows: jax.Array,
    cols: jax.Array,
    draw_after: int = 0,
    forbidden_depth: int = 2,
) -> EnvState:
    """Apply one move per board.  Finished games and illegal targets are
    frozen (no-op), keeping the batch in lockstep."""
    bsz, h, w = state.board.shape
    b = jnp.arange(bsz)
    if draw_after <= 0:
        draw_after = h * w

    active = state.outcome == int(GameOutcome.UNKNOWN)
    legal = active & (state.board[b, rows, cols] == NONE)
    sign = state.to_move

    placed = state.board.at[b, rows, cols].set(sign)
    new_board = jnp.where(legal[:, None, None], placed, state.board)
    new_count = state.move_count + legal.astype(jnp.int32)

    out = outcome_after(
        tables, new_board, rows, cols, sign, new_count, draw_after, forbidden_depth
    )
    new_outcome = jnp.where(legal, out, state.outcome)
    new_to_move = jnp.where(
        legal, jnp.where(sign == CROSS, CIRCLE, CROSS).astype(jnp.int8), state.to_move
    )
    return EnvState(new_board, new_to_move, new_outcome, new_count)


def _gather_boards(board: jax.Array, bidx: jax.Array) -> jax.Array:
    """Gather owner boards [K, H, W] for flat batch indices [K] with a
    one-hot dot (per-row gathers serialize on TPU; board values 0..2 are
    exact in bf16)."""
    bsz, h, w = board.shape
    onehot = bidx[:, None] == jnp.arange(bsz, dtype=jnp.int32)[None, :]
    return (
        jnp.einsum(
            "kb,bx->kx",
            onehot.astype(jnp.bfloat16),
            board.reshape(bsz, h * w).astype(jnp.bfloat16),
        )
        .astype(jnp.int8)
        .reshape(-1, h, w)
    )


def _escalate_forbidden(
    tables: RuleTables,
    board: jax.Array,
    forb_flat: jax.Array,
    unc_flat: jax.Array,
    depth: int,
    cap: int,
) -> tuple[jax.Array, jax.Array]:
    """Re-resolve up to `cap` globally-compacted uncertain cells at a deeper
    recursion.  forb_flat/unc_flat: [B*H*W] over the flattened cell grid.
    Returns the corrected (forb_flat, residual_unc_flat)."""
    bsz, h, w = board.shape
    n = forb_flat.shape[0]

    def run(_):
        K = min(cap, n)
        vals, idxs = jax.lax.top_k(unc_flat.astype(jnp.int32), K)  # [K]
        bidx = idxs // (h * w)
        cell = idxs % (h * w)
        gboards = _gather_boards(board, bidx)
        r, c = cell // w, cell % w
        f, u = is_forbidden_u(
            tables, gboards, r[:, None], c[:, None], depth, max_forks=None
        )
        f, u = f[:, 0] & (vals > 0), u[:, 0] & (vals > 0)
        eye = idxs[:, None] == jnp.arange(n)[None, :]
        res = (eye & f[:, None]).any(0)
        res_unc = (eye & u[:, None]).any(0)
        covered = (eye & (vals > 0)[:, None]).any(0)
        out = jnp.where(covered, res, forb_flat)
        return out, res_unc | (unc_flat & ~covered)

    return jax.lax.cond(
        jnp.any(unc_flat), run, lambda _: (forb_flat, unc_flat), operand=None
    )


def forbidden_plane(tables: RuleTables, board: jax.Array, depth: int = 2) -> jax.Array:
    """[B, H, W] bool: renju-forbidden empty cells for black, for NN feature
    planes and move generation.  Non-renju rules return all-false.
    See forbidden_plane_u; this drops the certificate."""
    return forbidden_plane_u(tables, board, depth)[0]


def forbidden_plane_u(
    tables: RuleTables, board: jax.Array, depth: int = 2,
    escalate_depth: int = 3, escalate_cap: int = 32,
) -> tuple[jax.Array, jax.Array]:
    """[B, H, W] forbidden plane plus a [B, H, W] residual-uncertainty
    certificate (all-False == provably exact vs the unbounded host recursion,
    src/game/rules.cpp:134-173).

    Naive threats come from the gather-free all-cells path; only cells whose
    naive threat is FORK_3x3 need per-cell resolution.  Fork cells are rare
    (~0.03/board in random play), so the resolution compacts them GLOBALLY
    across the batch — top-k over the flattened [B*H*W] fork mask — and runs
    the deep check on at most 128 (query, owner-board) pairs total, instead
    of a fixed per-board block.  That keeps the x16-per-level recursion
    widening on a ~128-row batch rather than B*12 rows (a ~100x cut at
    batch 1024).

    Cells the bounded pass could not decide exactly — global-cap overflow or
    depth-exhausted nested fork chains, tracked by is_forbidden_u — are then
    re-resolved by a cond-gated escalation pass at `escalate_depth` on at
    most `escalate_cap` globally-compacted cells.  Anything still uncertain
    after escalation keeps the conservative (forbidden) upper bound and is
    reported in the returned certificate; tools/parity_fuzz.py asserts the
    residual is zero on selfplay-derived positions.
    """
    from ..patterns import bitwise  # deferred: avoids import cycle at load

    board = jnp.asarray(board)
    bsz, h, w = board.shape
    if tables.rules != GameRules.RENJU:
        z = jnp.zeros((bsz, h, w), bool)
        return z, z
    wins = windows_all(board)  # [B, 4, H, W]
    # gather-free classification for the bulk all-cells path
    pts, _ = bitwise.classify(jnp.moveaxis(wins, 1, -1), GameRules(tables.rules))
    threat = threat_type(tables, pts, jnp.zeros((bsz, h, w), bool))
    empty = board == NONE
    hard = empty & ((threat == T.TT_OVERLINE) | (threat == T.TT_FORK_4x4))
    fork = empty & (threat == T.TT_FORK_3x3)

    def resolve(_):
        K = min(128, bsz * h * w)
        flat = fork.reshape(bsz * h * w)
        vals, idxs = jax.lax.top_k(flat.astype(jnp.int32), K)  # [K]
        bidx = idxs // (h * w)
        cell = idxs % (h * w)
        r, c = cell // w, cell % w
        gboards = _gather_boards(board, bidx)
        f, u = is_forbidden_u(
            tables, gboards, r[:, None], c[:, None], depth, max_forks=None
        )
        f = f[:, 0] & (vals > 0)
        u = u[:, 0] & (vals > 0)
        # scatter the verdicts back with a compare-any (no per-row scatter)
        eye = idxs[:, None] == jnp.arange(bsz * h * w)[None, :]
        res = (eye & f[:, None]).any(0)
        res_unc = (eye & u[:, None]).any(0)
        covered = (eye & (vals > 0)[:, None]).any(0)
        # overflow past the global cap keeps the naive (forbidden) upper
        # bound, flagged uncertain for the escalation pass
        forb_flat = res | (flat & ~covered)
        unc_flat = res_unc | (flat & ~covered)
        return _escalate_forbidden(
            tables, board, forb_flat, unc_flat, escalate_depth, escalate_cap
        )

    zflat = jnp.zeros(bsz * h * w, bool)
    resolved_forks, residual = jax.lax.cond(
        jnp.any(fork), resolve, lambda _: (zflat, zflat), operand=None
    )
    plane = hard | resolved_forks.reshape(bsz, h, w)
    return plane, residual.reshape(bsz, h, w)
