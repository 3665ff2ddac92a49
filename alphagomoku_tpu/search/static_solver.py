"""Static threat solver: forced-win/forced-loss detection from threat planes,
as pure bit arithmetic on the packed 32-bit feature map.

This re-expresses the sound core of the reference's staged tactical move
generator (reference: src/search/alpha_beta/MoveGenerator.cpp stages
win_in_1, draw_in_1, defend loss_in_2, win_in_3; modes BASIC/STATIC,
MoveGenerator.hpp:29-36) for the lockstep batch.  The packed feature word of
a cell already encodes, for both players, "the threat a stone here would
create" (patterns.features bit layout), so the stages reduce to masked bit
tests — no per-position pattern recomputation.

Stages implemented (all SOUND, no heuristic pruning):
  1. win_in_1:   own five-completion cells -> Score win_in(1).
  2. loss_in_2:  opponent five-completion cells exist; only blocking moves
     (or own wins) are playable; with two or more distinct completion cells
     the position is lost in 2 plies regardless of the reply.
  3. win_in_3:   cells making an open four / double four / 4x4 fork with no
     opponent five threat on the board -> Score win_in(3) (the opponent has
     no four, so no defense stops two five threats).
  4. draw_in_1:  with `dist_to_draw` given, positions one move from the
     draw_after horizon score every legal non-winning cell draw_in(1); a
     renju black with NO legal cell (everything forbidden) is loss_in(1)
     (reference: MoveGenerator::try_draw_in_1, MoveGenerator.cpp:305-353).
     The deeper stages are gated by the same distance arithmetic the
     reference uses (win_in_1 at >=1, defend_loss_in_2 at >=2, win_in_3 at
     >=3 — MoveGenerator.cpp:162-186): a mate cannot be proven past the
     draw horizon.

Deeper variation-dependent lines (VCF / win_in_5 / defensive tables) belong
to the recursive solver (see SURVEY.md section 2.4); everything here is a
static property of the current position.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import score as S

U = np.uint32

# feature bit offsets (patterns.features; reference NNInputFeatures layout)
_OWN = 8
_OPP = 20
_HO4_SHIFT = 4  # within a player group: bits 4-7 half-open four per direction
_OPEN4_BIT = 8
_DOUBLE4_BIT = 9
_FIVE_BIT = 10
_OVERLINE_BIT = 11


class StaticAnalysis(NamedTuple):
    """Per-cell tactical scores + playable-move restriction."""

    action_scores: jax.Array  # [B, H, W] uint16 packed Score (mover's view)
    restrict: jax.Array  # [B, H, W] bool: moves worth generating
    node_score: jax.Array  # [B] uint16: statically proven position score


def _popcount4(x: jax.Array) -> jax.Array:
    """Popcount of a 4-bit field."""
    return (x & 1) + ((x >> 1) & 1) + ((x >> 2) & 1) + ((x >> 3) & 1)


def analyze(
    packed: jax.Array, legal: jax.Array, dist_to_draw: jax.Array | None = None
) -> StaticAnalysis:
    """Run the static stages on a packed feature map [B, H, W] uint32.

    `legal` excludes occupied + renju-forbidden cells.  Scores and the
    restriction mask are from the side-to-move's perspective (the packed
    map's 'own' player).  `dist_to_draw` [B] int32 = draw_after - stones
    enables draw proving + the reference's distance gating; None means an
    unreachable horizon (freestyle default draw_after = board area callers
    pass the real value)."""
    own = (packed >> U(_OWN)) & U(0xFFF)
    opp = (packed >> U(_OPP)) & U(0xFFF)

    own5 = legal & (((own >> U(_FIVE_BIT)) & 1) == 1)
    opp5 = legal & (((opp >> U(_FIVE_BIT)) & 1) == 1)

    own_ho4 = _popcount4((own >> U(_HO4_SHIFT)) & U(0xF))
    own_open4 = ((own >> U(_OPEN4_BIT)) & 1) == 1
    own_d4 = ((own >> U(_DOUBLE4_BIT)) & 1) == 1
    # open four, double four (two fives in one line), or a 4x4 fork
    # (four threats in two or more directions) all yield win in 3
    # (reference: ThreatTable fork classification + MoveGenerator win_in_3)
    own_win3 = legal & (own_open4 | own_d4 | (own_ho4 + own_open4.astype(own_ho4.dtype) >= 2))

    any_own5 = jnp.any(own5, axis=(1, 2))
    n_opp5 = opp5.sum((1, 2))
    any_opp5 = n_opp5 > 0
    lost2 = (~any_own5) & (n_opp5 >= 2)

    if dist_to_draw is None:
        dtd3 = dtd2 = jnp.ones(packed.shape[0], bool)
        draw1 = jnp.zeros(packed.shape[0], bool)
    else:
        dtd3 = dist_to_draw >= 3
        dtd2 = dist_to_draw >= 2
        draw1 = dist_to_draw == 1

    # --- per-cell scores, later stages never overwrite earlier ones ---
    scores = jnp.broadcast_to(S.zero(), packed.shape)
    # stage 3: win in 3 (valid only when the opponent holds no five threat
    # and the mate fits inside the draw horizon)
    win3_ok = own_win3 & (~any_opp5 & dtd3)[:, None, None]
    scores = jnp.where(win3_ok, S.win_in(3), scores)
    # stage 2: everything that does not block (or win) loses in 2
    blockers = own5 | opp5  # playing the opponent's completion cell blocks it
    loses2 = ((any_opp5 & dtd2)[:, None, None] & ~blockers) \
        | (lost2 & dtd2)[:, None, None]
    scores = jnp.where(legal & loses2, S.loss_in(2), scores)
    # stage draw_in_1: one move from the horizon every legal non-winning
    # cell draws (reference: try_draw_in_1)
    scores = jnp.where(draw1[:, None, None] & legal & ~own5, S.draw_in(1), scores)
    # stage 1: win in 1 dominates
    scores = jnp.where(own5, S.win_in(1), scores)
    scores = jnp.where(legal, scores, S.zero()).astype(jnp.uint16)

    # --- playable restriction: with an opponent five on the board only
    # wins/blocks are worth generating (reference: must_defend edges) ---
    restrict = jnp.where(
        (any_opp5 & ~any_own5 & dtd2)[:, None, None], blockers & legal, legal
    )
    # degenerate safety: never restrict to an empty set
    restrict = jnp.where(
        jnp.any(restrict, (1, 2), keepdims=True), restrict, legal
    )

    node_score = jnp.where(
        any_own5,
        S.win_in(1),
        jnp.where(lost2 & dtd2, S.loss_in(2), S.zero()),
    )
    if dist_to_draw is not None:
        any_legal = jnp.any(legal, (1, 2))
        # no win and one move to the horizon: a legal move draws; a renju
        # black with every empty cell forbidden has only losing moves
        node_score = jnp.where(
            draw1 & ~any_own5,
            jnp.where(any_legal, S.draw_in(1), S.loss_in(1)),
            node_score,
        )
    return StaticAnalysis(scores.astype(jnp.uint16), restrict,
                          node_score.astype(jnp.uint16))
