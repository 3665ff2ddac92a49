"""Draw-horizon and solver-LOSS exactness report (VERDICT r4 task 10 —
extend the renju-certificate workflow to the draw/loss paths).

Part A — draw_after horizon: random legal trajectories are stepped and
every post-move outcome is compared THREE ways — the compiled reference
oracle (`outcome_d`, the reference's getOutcome with an explicit
numberOfMovesForDraw), the host twin (game/rules.get_outcome), and the
jitted batched env (game/vectorized.outcome_after) — asserting zero
divergence on every (position, draw_after) pair.

Part B — LOSS distances: fork-dense positions + trajectory positions run
through the batched fail-low prover (vct_batched.solve_loss levels=2);
every claimed loss is verified against the INDEPENDENT host VCT (each
enumerated defensive option refuted + sampled non-enumerated defenses) and
its mate distance cross-checked against the host alpha-beta twin
(minimax.solve_ab) where that oracle proves within its depth budget.

Usage: python tools/drawloss_exactness.py [--report reports/...json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from alphagomoku_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rules", default="FREESTYLE,STANDARD,RENJU,CARO5,CARO6")
    ap.add_argument("--trajs", type=int, default=64)
    ap.add_argument("--draw-after", default="12,20,30")
    ap.add_argument("--loss-boards", type=int, default=192)
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from parity_fuzz import Oracle
    from alphagomoku_tpu.game.types import (
        CROSS, CIRCLE, NONE, GameOutcome, GameRules, Move,
    )
    from alphagomoku_tpu.game import rules as R
    from alphagomoku_tpu.game import vectorized as V
    from alphagomoku_tpu.search import minimax as MM
    from alphagomoku_tpu.search import move_generator as MG
    from alphagomoku_tpu.search import vct as HostVCT
    from alphagomoku_tpu.search import vct_batched as VB

    h = w = args.size
    rng = np.random.default_rng(args.seed)
    report: dict = {"what": __doc__.split("\n")[0], "parts": {}}

    # ---- part A: draw_after horizon ------------------------------------
    oracle = Oracle()
    draw_afters = [int(x) for x in args.draw_after.split(",")]
    part_a = []
    for rules_name in args.rules.split(","):
        rules = GameRules[rules_name]
        tables = V.device_tables(rules)
        oracle.set_rules(rules_name)

        steps_board, steps_r, steps_c, steps_sign, steps_cnt = [], [], [], [], []
        ref_out = {d: [] for d in draw_afters}
        host_out = {d: [] for d in draw_afters}
        for _ in range(args.trajs):
            board = np.zeros((h, w), np.int8)
            sign = CROSS
            order = rng.permutation(h * w)
            for k, cell in enumerate(order[: rng.integers(15, 45)]):
                r, c = int(cell // w), int(cell % w)
                # the reference convention: outcome is computed on the board
                # INCLUDING the last move (Game.cpp:119 current_board after
                # makeMove; numberOfMoves counts placed stones)
                board[r, c] = sign
                oracle.set_board(board)
                cnt = k + 1
                steps_board.append(board.copy())
                steps_r.append(r)
                steps_c.append(c)
                steps_sign.append(sign)
                steps_cnt.append(cnt)
                sletter = "X" if sign == CROSS else "O"
                stop = False
                for d in draw_afters:
                    o_ref = oracle.ask(f"outcome_d {r} {c} {sletter} {d}")
                    ref_out[d].append(int(o_ref))
                    host_out[d].append(int(R.get_outcome(
                        rules, board, Move(row=r, col=c, sign=sign),
                        number_of_moves_for_draw=d,
                    )))
                    if ref_out[d][-1] not in (
                        int(GameOutcome.UNKNOWN), int(GameOutcome.DRAW)
                    ):
                        stop = True
                if stop:
                    break
                sign = CIRCLE if sign == CROSS else CROSS

        boards_j = jnp.asarray(np.stack(steps_board))
        rows_j = jnp.asarray(np.asarray(steps_r, np.int32))
        cols_j = jnp.asarray(np.asarray(steps_c, np.int32))
        signs_j = jnp.asarray(np.asarray(steps_sign, np.int8))
        cnt_j = jnp.asarray(np.asarray(steps_cnt, np.int32))
        div_host = div_jit = 0
        checks = 0
        f = jax.jit(
            lambda b, r, c, s, n, d: V.outcome_after(tables, b, r, c, s, n, d),
            static_argnums=(5,),
        )
        for d in draw_afters:
            jit_out = np.asarray(f(boards_j, rows_j, cols_j, signs_j, cnt_j, d))
            ref = np.asarray(ref_out[d], np.int32)
            div_host += int((np.asarray(host_out[d], np.int32) != ref).sum())
            div_jit += int((jit_out.astype(np.int32) != ref).sum())
            checks += len(ref)
        part_a.append({
            "rules": rules_name, "outcome_checks": checks,
            "draw_afters": draw_afters,
            "div_host_vs_ref": div_host, "div_jit_vs_ref": div_jit,
        })
        print(part_a[-1], flush=True)
    oracle.close()
    report["parts"]["draw_after"] = part_a

    # ---- part B: LOSS claims + distances (freestyle) --------------------
    tables = V.device_tables(GameRules.FREESTYLE)
    boards = []
    for _ in range(args.loss_boards):
        b = np.zeros((h, w), np.int8)
        r0, c0 = rng.integers(3, 9, size=2)
        n = rng.integers(5, 11)
        rs = np.clip(r0 + rng.integers(0, 6, size=n), 0, h - 1)
        cs = np.clip(c0 + rng.integers(0, 6, size=n), 0, w - 1)
        b[rs, cs] = CIRCLE
        for _ in range(rng.integers(1, 4)):
            r, c = rng.integers(0, h, size=2)
            if b[r, c] == NONE:
                b[r, c] = CROSS
        boards.append(b)
    batch = jnp.asarray(np.stack(boards))
    stm = jnp.full((len(boards),), CROSS, jnp.int8)
    res = VB.solve_loss(tables, batch, stm, max_options=12, max_depth=8,
                        max_steps=512, levels=2)
    prep = VB.prepare_loss(tables, batch, stm, max_options=12)
    loss = np.asarray(res.loss)
    dist = np.asarray(res.distance)
    valid = np.asarray(prep.valid)
    child = np.asarray(prep.child_board).reshape(len(boards), 12, h, w)

    claims = int(loss.sum())
    opt_checks = opt_fail = extra_checks = extra_fail = 0
    ab_proven = ab_dist_match = ab_unproven = 0
    for i in np.where(loss)[0]:
        for m in range(12):
            if not valid[i, m]:
                continue
            win = HostVCT.solve(child[i, m], CIRCLE, GameRules.FREESTYLE,
                                max_depth=12, node_budget=120000).win
            opt_checks += 1
            opt_fail += 0 if win else 1
        opts_cells = {
            tuple(np.argwhere(child[i, m] != boards[i])[0])
            for m in range(12) if valid[i, m]
        }
        empties = [tuple(x) for x in np.argwhere(boards[i] == NONE)
                   if tuple(x) not in opts_cells]
        for j in rng.choice(len(empties), size=min(4, len(empties)),
                            replace=False):
            r, c = empties[j]
            b2 = boards[i].copy()
            b2[r, c] = CROSS
            win = HostVCT.solve(b2, CIRCLE, GameRules.FREESTYLE,
                                max_depth=12, node_budget=120000).win
            extra_checks += 1
            extra_fail += 0 if win else 1
        # distance cross-check vs the host alpha-beta twin.  Both provers
        # certify the LOSS; distances are PLAY-LINE lengths, not
        # game-theoretic minima (the reference's alpha-beta has the same
        # property — it breaks on the first win found).  The deepening ab
        # twin yields near-minimal distances, the batched prover's child
        # VCT may find a longer win line, so the invariant is: same
        # verdict, same parity, batched >= ab.
        s_ab, _ = MM.solve_ab(boards[i], CROSS, GameRules.FREESTYLE,
                              max_depth=12, node_budget=200000)
        if (s_ab >> 13) == MG._PV_LOSS:
            ab_proven += 1
            ab_d = (s_ab & 8191) - 4000
            if ab_d == int(dist[i]):
                ab_dist_match += 1
            assert int(dist[i]) >= ab_d and (int(dist[i]) - ab_d) % 2 == 0, (
                i, int(dist[i]), ab_d)
        else:
            ab_unproven += 1

    report["parts"]["loss"] = {
        "boards": len(boards), "claims": claims,
        "option_checks": opt_checks, "option_failures": opt_fail,
        "sampled_defense_checks": extra_checks,
        "sampled_defense_failures": extra_fail,
        "ab_twin_proven": ab_proven,
        "ab_twin_distance_exact_matches": ab_dist_match,
        "ab_twin_distance_upper_bound_ok": ab_proven,
        "ab_twin_unproven_within_budget": ab_unproven,
    }
    print(report["parts"]["loss"], flush=True)

    ok = (
        all(p["div_host_vs_ref"] == 0 and p["div_jit_vs_ref"] == 0
            for p in part_a)
        and opt_fail == 0 and extra_fail == 0
    )
    report["ok"] = ok
    if args.report:
        with open(args.report, "w") as fh:
            json.dump(report, fh, indent=1)
        print("report ->", args.report)
    print("OK" if ok else "DIVERGENCE FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
