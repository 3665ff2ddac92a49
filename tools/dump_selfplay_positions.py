"""Dump selfplay-derived positions to an npz for the parity fuzz
(VERDICT r3 task 4: renju jit exactness must be asserted on >=10K
selfplay-derived positions, not just synthetic boards).

Runs real lockstep MCTS selfplay (random-init net => noise+search-guided
play, the round-0 selfplay distribution) and stores every live position.

Usage: python tools/dump_selfplay_positions.py --rules RENJU \
         --out /tmp/renju_positions.npz [--games 256] [--sims 16] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rules", default="RENJU")
    ap.add_argument("--out", default="/tmp/positions.npz")
    ap.add_argument("--games", type=int, default=256)
    ap.add_argument("--sims", type=int, default=16)
    ap.add_argument("--max-moves", type=int, default=80)
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from alphagomoku_tpu.game.types import GameRules
    from alphagomoku_tpu.game import vectorized as V
    from alphagomoku_tpu.models import create_network
    from alphagomoku_tpu.search import mcts
    from alphagomoku_tpu.selfplay import SelfplayConfig, play_games

    rules = GameRules[args.rules]
    tables = V.device_tables(rules)
    net = create_network("FastPolicy", blocks=1, filters=16)
    x = jnp.zeros((1, args.size, args.size, net.cfg.input_planes), jnp.float32)
    variables = net.init(jax.random.PRNGKey(args.seed), x, train=False)

    def apply(v, planes):
        return net.apply(v, planes, train=False)

    mcfg = mcts.MCTSConfig(
        max_nodes=args.sims + 8, max_edges=32, max_depth=16,
        leaf_solver="none",
    )
    scfg = SelfplayConfig(
        num_simulations=args.sims, temperature_moves=12, noise_weight=0.25,
        max_moves=args.max_moves,
    )
    res = play_games(
        apply, variables, tables, mcfg, scfg,
        jax.random.PRNGKey(args.seed + 1), args.games, args.size, args.size,
    )
    boards = np.asarray(res.record.board)  # [M, B, H, W]
    alive = np.asarray(res.record.alive)  # [M, B]
    flat = boards[alive]  # [N, H, W]
    # drop empty boards (ply 0 duplicates) beyond one instance
    nonzero = (flat != 0).any((1, 2))
    keep = flat[nonzero]
    np.savez_compressed(args.out, boards=keep.astype(np.int8))
    print(f"wrote {keep.shape[0]} positions to {args.out}")


if __name__ == "__main__":
    main()
