"""Elo gate for the in-search solver: paired match solver-on vs solver-off
at equal simulations (VERDICT round-1 task 1 'Done' criterion).

Both sides share one (untrained or checkpointed) network; only
MCTSConfig.leaf_solver differs, so the Elo delta isolates the solver's
contribution (reference capability: the AlphaBetaSearch leg's tactical
strength, Search.cpp:159-183).

--gate loss_prover instead isolates the LOSS prover: BOTH sides run the
VCT win solver; only side A adds loss proving (VERDICT r3 task 6).

Usage: python tools/elo_solver_gate.py [--pairs 24] [--sims 64] [--size 9]
       [--solver vct] [--steps 16] [--cpu] [--checkpoint ckpt.msgpack]
       [--gate solver|loss_prover]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from alphagomoku_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", type=int, default=24)
    p.add_argument("--sims", type=int, default=64)
    p.add_argument("--size", type=int, default=9)
    p.add_argument("--rules", default="FREESTYLE")
    p.add_argument("--solver", default="vct", choices=["vcf", "vct"])
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--arch", default="FastPolicy")
    p.add_argument("--blocks", type=int, default=1)
    p.add_argument("--filters", type=int, default=16)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--max-moves", type=int, default=80)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--gate", default="solver", choices=["solver", "loss_prover"])
    p.add_argument("--loss-cap", type=int, default=32)
    args = p.parse_args()

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
    from alphagomoku_tpu.eval import match as M

    rules = GameRules[args.rules]
    h = w = args.size
    tables = V.device_tables(rules)
    net = create_network(args.arch, blocks=args.blocks, filters=args.filters)
    x = jnp.zeros((1, h, w, net.cfg.input_planes), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    if args.checkpoint:
        from flax import serialization

        with open(args.checkpoint, "rb") as fh:
            variables = serialization.from_bytes(variables, fh.read())

    def apply(v, planes):
        return net.apply(v, planes, train=False)

    base = dict(max_nodes=args.sims + 8, max_edges=h * w, max_depth=24)
    if args.gate == "loss_prover":
        # both sides run the win solver; A adds the loss prover
        common = dict(
            leaf_solver=args.solver, leaf_solver_steps=args.steps,
            leaf_solver_depth=args.depth,
        )
        cfg_on = mcts.MCTSConfig(
            **base, **common, loss_prover=True, loss_cap=args.loss_cap)
        cfg_off = mcts.MCTSConfig(**base, **common)
    else:
        cfg_on = mcts.MCTSConfig(
            **base, leaf_solver=args.solver, leaf_solver_steps=args.steps,
            leaf_solver_depth=args.depth)
        cfg_off = mcts.MCTSConfig(**base, leaf_solver="none")

    rng = np.random.default_rng(0)
    openings = M.random_openings(rng, args.pairs, h, w, stones=4)
    t0 = time.time()
    res = M.play_match(
        apply, variables, apply, variables, tables, cfg_on,
        args.sims, openings, max_moves=args.max_moves,
        raw_input_a=net.cfg.raw_input, raw_input_b=net.cfg.raw_input,
        mcfg_b=cfg_off,
    )
    dt = time.time() - t0
    out = {
        "gate": args.gate,
        "solver": args.solver,
        "steps": args.steps,
        "sims": args.sims,
        "pairs": args.pairs,
        "pentanomial": res.pentanomial.tolist(),
        "score_solver_on": round(res.score_a, 4),
        "elo_solver_on": round(res.elo_a, 1),
        "seconds": round(dt, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
