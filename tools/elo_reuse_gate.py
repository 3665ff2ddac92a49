"""Elo gate for between-move tree reuse at equal per-move simulations
(VERDICT r3 task 6).

Paired match, one shared network: side A carries its search tree across
moves (mcts.reuse_or_init_root advanced after EVERY ply, so the root
always points at the current position), side B searches fresh each move.
Both sides spend exactly `--sims` new simulations per move — lanes where A
is not to move are restored after the simulation scan, so reuse's only
edge is the carried statistics (reference: Tree::setBoard +
NodeCache::cleanup carry-over, Tree.cpp:128-151).

Usage: python tools/elo_reuse_gate.py [--pairs 24] [--sims 64] [--size 9]
       [--cpu] [--checkpoint ckpt.msgpack]
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
    p.add_argument("--arch", default="FastPolicy")
    p.add_argument("--blocks", type=int, default=1)
    p.add_argument("--filters", type=int, default=16)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--max-moves", type=int, default=80)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from alphagomoku_tpu.game.types import GameRules, CROSS, CIRCLE, GameOutcome
    from alphagomoku_tpu.game import vectorized as V
    from alphagomoku_tpu.models import create_network
    from alphagomoku_tpu.search import mcts
    from alphagomoku_tpu.eval import match as M

    rules = GameRules[args.rules]
    h = w = args.size
    g = args.pairs
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

    sims = args.sims
    cfg = mcts.MCTSConfig(
        max_nodes=3 * sims + 8, max_edges=h * w, max_depth=24
    )
    cfg_fresh = cfg._replace(max_nodes=sims + 8)

    rng = np.random.default_rng(0)
    openings = M.random_openings(rng, g, h, w, stones=4)
    # block 0: A plays cross; block 1: B plays cross — same openings
    boards0 = np.concatenate([openings, openings], 0)  # [2G, H, W]
    env = V.EnvState(
        board=jnp.asarray(boards0),
        to_move=jnp.full(2 * g, CROSS, jnp.int8),
        outcome=jnp.full(2 * g, int(GameOutcome.UNKNOWN), jnp.int8),
        move_count=jnp.full(2 * g, int((openings[0] != 0).sum()), jnp.int32),
    )

    simulate = mcts.make_simulate_fn(apply, tables, cfg, True)
    steps_n = sims  # leaf_batch = 1

    def select_lanes(mask, st_new, st_old):
        def pick(a, b):
            m = mask.reshape((mask.shape[0],) + (1,) * (a.ndim - 1))
            return jnp.where(m, a, b)

        return jax.tree_util.tree_map(pick, st_new, st_old)

    @jax.jit
    def init_state(v, board, stm):
        return mcts.init_root(apply, v, tables, cfg, board, stm, True)

    @jax.jit
    def sims_on(v, st, lane_mask):
        def step(s, _):
            return simulate(v, s), None

        grown, _ = jax.lax.scan(step, st, None, length=steps_n)
        return select_lanes(lane_mask, grown, st)

    @jax.jit
    def fresh_search(v, board, stm):
        st = mcts.run_search(apply, v, tables, cfg_fresh, board, stm, sims)
        return mcts.select_move(st)

    @jax.jit
    def advance(v, st, mv, board, stm):
        return mcts.reuse_or_init_root(
            apply, v, tables, cfg, st, mv, board, stm, reserve=sims + 8
        )

    st_a = init_state(variables, env.board, env.to_move)
    a_is_cross = np.zeros(2 * g, bool)
    a_is_cross[:g] = True
    a_is_cross_j = jnp.asarray(a_is_cross)

    t0 = time.time()
    for ply in range(args.max_moves):
        stm_cross = bool((ply % 2) == 0)
        a_turn = a_is_cross_j if stm_cross else ~a_is_cross_j
        # A: grow the carried trees by `sims` on its to-move lanes
        st_a = sims_on(variables, st_a, a_turn)
        mv_a = mcts.select_move(st_a)
        # B: fresh search on its to-move lanes (run on all, use half —
        # lockstep simplicity; equal sims per MOVE holds for both sides)
        mv_b = fresh_search(variables, env.board, env.to_move)
        moves = jnp.where(a_turn, mv_a, mv_b)
        live = env.outcome == jnp.int8(int(GameOutcome.UNKNOWN))
        env = V.env_step(tables, env, moves // w, moves % w)
        # advance A's carry along whatever was just played, every lane
        adv_mv = jnp.where(live, moves, -1)
        st_a = advance(variables, st_a, adv_mv, env.board, env.to_move)
        if bool(jnp.all(env.outcome != jnp.int8(int(GameOutcome.UNKNOWN)))):
            break

    outcomes = np.asarray(env.outcome)
    # score from A's perspective: block 0 A=cross, block 1 A=circle
    def score_of(out, a_cross):
        if out == int(GameOutcome.DRAW) or out == int(GameOutcome.UNKNOWN):
            return 0.5
        won_cross = out == int(GameOutcome.CROSS_WIN)
        return 1.0 if (won_cross == a_cross) else 0.0

    scores = [score_of(int(o), bool(a_is_cross[i])) for i, o in enumerate(outcomes)]
    penta = [0] * 5
    for k in range(g):
        s = scores[k] + scores[g + k]
        penta[int(round(2 * s))] += 1
    score = float(np.mean(scores))
    elo = M.elo_from_winrate(score)
    out = {
        "gate": "tree_reuse",
        "sims": sims,
        "pairs": g,
        "pentanomial": penta,
        "score_reuse_on": round(score, 4),
        "elo_reuse_on": round(elo, 1),
        "unfinished": int((outcomes == int(GameOutcome.UNKNOWN)).sum()),
        "seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
