"""Frozen absolute-strength anchor opponent.

A deterministic, net-free evaluator with the network interface
(NetOutput), so the standard match machinery (eval/match.play_multi_match)
can rate any checkpoint against a REPRODUCIBLE fixed opponent across
training runs and rounds: the anchor has no parameters to drift — its
policy is a pure function of the input planes (adjacency + center prior),
its value is uniform, and all of its tactical strength comes from the
search it is run under (pin the anchor MCTSConfig: ANCHOR_MCFG — 200 sims,
VCT leaf solver).

The reference has no equivalent component; this fills the VERDICT-r3 gap
"Elo evidence is self-relative only" with an absolute scale: report each
round's best checkpoint vs AnchorV1 at ANCHOR_MCFG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.networks import NetOutput
from ..search import mcts

ANCHOR_VERSION = "AnchorV1"

# pin the anchor's search so its playing strength is reproducible
ANCHOR_SIMS = 200
ANCHOR_MCFG = mcts.MCTSConfig(
    max_nodes=ANCHOR_SIMS + 8,
    max_edges=32,
    max_depth=32,
    leaf_solver="vct",
    leaf_solver_steps=16,
    leaf_solver_cap=64,
)

# AnchorV2: the next tier of the absolute ladder — same net-free policy,
# 4x the pinned search (the r5 flagship SATURATES AnchorV1 at 48/48, so a
# stronger frozen opponent keeps the scale informative going forward)
ANCHOR_V2_VERSION = "AnchorV2"
ANCHOR_V2_SIMS = 800
ANCHOR_V2_MCFG = mcts.MCTSConfig(
    max_nodes=ANCHOR_V2_SIMS + 8,
    max_edges=32,
    max_depth=32,
    leaf_solver="vct",
    leaf_solver_steps=16,
    leaf_solver_cap=128,
)


def anchor_apply(variables, planes: jax.Array) -> NetOutput:
    """Net-interface evaluator: planes [B, H, W, 8] raw bit-planes
    (patterns/features.py bits 0-7: legal, own stone, opp stone, ...).

    Policy: stones within Chebyshev distance 2 of a cell, distance-1
    neighbors double-weighted, plus a centered prior — the classic
    neighborhood move prior.  Value: uniform win/draw/loss.  `variables`
    is ignored (pass {})."""
    own = planes[..., 1].astype(jnp.float32)
    opp = planes[..., 2].astype(jnp.float32)
    occ = own + opp
    b, h, w = occ.shape

    pad = jnp.pad(occ, ((0, 0), (2, 2), (2, 2)))
    near = jnp.zeros_like(occ)
    for dr in range(-2, 3):
        for dc in range(-2, 3):
            if dr == 0 and dc == 0:
                continue
            weight = 2.0 if max(abs(dr), abs(dc)) == 1 else 1.0
            near = near + weight * pad[:, 2 + dr : 2 + dr + h, 2 + dc : 2 + dc + w]

    r = jnp.arange(h, dtype=jnp.float32)[:, None]
    c = jnp.arange(w, dtype=jnp.float32)[None, :]
    center = -0.08 * (jnp.abs(r - (h - 1) / 2.0) + jnp.abs(c - (w - 1) / 2.0))
    logits = 0.6 * near + center[None]

    value_logits = jnp.zeros((b, 3), jnp.float32)
    return NetOutput(
        policy_logits=logits,
        value_logits=value_logits,
        q_logits=None,
        moves_left_logits=None,
        soft_policy_logits=None,
    )


def anchor_opponent(version: str = ANCHOR_VERSION):
    """eval.match.Opponent for the anchor (import here to avoid cycles)."""
    from .match import Opponent

    mcfg = ANCHOR_V2_MCFG if version == ANCHOR_V2_VERSION else ANCHOR_MCFG
    return Opponent(
        net_apply=anchor_apply,
        variables={},
        raw_input=True,
        mcfg=mcfg,
        name=version,
        # uniform value head: cannot adjudicate truncated games — such
        # pairs are excluded from the score instead of scoring free draws
        calibrated_value=False,
    )
