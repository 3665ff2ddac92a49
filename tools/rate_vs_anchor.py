"""Rate a checkpoint against the frozen AnchorV1 opponent (absolute
cross-round Elo scale; eval/anchor.py).

Usage: python tools/rate_vs_anchor.py --checkpoint runs/.../network_N.msgpack
       [--blocks 6] [--filters 64] [--pairs 24] [--sims 200] [--size 15]
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=False, default=None)
    ap.add_argument("--arch", default="ConvNextPVQMraw")
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--filters", type=int, default=64)
    ap.add_argument("--pairs", type=int, default=24)
    ap.add_argument("--sims", type=int, default=200)
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--rules", default="FREESTYLE")
    # default 0 = play to the rule outcome (no truncation at all — the
    # anchor's uniform value cannot adjudicate truncated games)
    ap.add_argument("--max-moves", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--anchor", default="v1", choices=["v1", "v2"])
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
    from alphagomoku_tpu.eval import match as M
    from alphagomoku_tpu.eval.anchor import (
        anchor_opponent, ANCHOR_VERSION, ANCHOR_V2_VERSION, ANCHOR_MCFG,
    )

    version = ANCHOR_V2_VERSION if args.anchor == "v2" else ANCHOR_VERSION

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

    rng = np.random.default_rng(0)
    openings = M.random_openings(rng, args.pairs, h, w, stones=4)
    t0 = time.time()
    results = M.play_multi_match(
        apply, variables, [anchor_opponent(version)], tables,
        ANCHOR_MCFG, args.sims, openings,
        max_moves=(args.max_moves if args.max_moves > 0 else None),
        raw_input_a=net.cfg.raw_input,
    )
    res = results[0]
    print(json.dumps({
        "anchor": version,
        "checkpoint": args.checkpoint or "(random init)",
        "sims": args.sims,
        "pairs": args.pairs,
        "pentanomial": res.pentanomial.tolist(),
        "score_vs_anchor": round(res.score_a, 4),
        "elo_vs_anchor": round(res.elo_a, 1),
        "unfinished": res.truncated,
        "seconds": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
