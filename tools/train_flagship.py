"""Flagship training run at reference scale (VERDICT r3 task 2).

15x15 freestyle, the 6x64 ConvNext flagship, 400 sims/move, with the
ENGINE-DEFAULT configuration the reference trains with: the VCT leaf
solver inside every selfplay search, between-move tree reuse, balanced
(solver-checked) openings, gating, and async multi-opponent rating —
i.e. the TrainingManager defaults (reference loop:
/root/reference/src/selfplay/TrainingManager.cpp:84-137).

Runs until --hours wall-clock is spent (checkpoint-resumable: re-running
continues from metadata.json).  Use tools/report_training.py to render
the learning curve + gating ladder + rating table for the README.

Usage: python tools/train_flagship.py [--hours 4] [--dir runs/flagship_r4]
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
    ap.add_argument("--hours", type=float, default=4.0)
    ap.add_argument("--dir", default="runs/flagship_r4")
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--filters", type=int, default=64)
    ap.add_argument("--sims", type=int, default=400)
    ap.add_argument("--games", type=int, default=256)
    ap.add_argument("--batch", type=int, default=256)
    # the axon remote-device tunnel can deadlock when the async evaluation
    # thread and the main thread submit device work concurrently (observed
    # twice in round 5, both times freezing the run for >25 min at ~0 CPU);
    # --serial-eval runs the rating matches synchronously instead
    ap.add_argument("--serial-eval", action="store_true")
    args = ap.parse_args()

    from alphagomoku_tpu.game.types import GameRules
    from alphagomoku_tpu.training.manager import ManagerConfig, TrainingManager

    cfg = ManagerConfig(
        working_dir=args.dir,
        rules=GameRules.FREESTYLE,
        rows=15,
        cols=15,
        architecture="ConvNextPVQMraw",
        blocks=args.blocks,
        filters=args.filters,
        games_per_iteration=args.games,
        selfplay_batch=args.batch,
        num_simulations=args.sims,
        train_steps_per_iteration=400,
        train_batch_size=512,
        buffer_window=20,
        use_gating=True,
        gating_games=64,
        use_evaluation=True,
        eval_opponents=(-1, -2, -4),
        eval_games=32,
        eval_in_parallel=not args.serial_eval,
        # engine defaults: VCT leaf solver, compacted; tree reuse
        leaf_solver="vct",
        leaf_solver_steps=16,
        leaf_solver_cap=256,
        tree_reuse=True,
        balanced_openings=True,
        opening_stones=4,
        seed=4,
    )
    mgr = TrainingManager(cfg)
    deadline = time.time() + args.hours * 3600.0
    i = mgr.metadata["last_checkpoint"] + 1
    log_path = os.path.join(args.dir, "flagship_run_log.jsonl")
    while time.time() < deadline:
        t0 = time.time()
        metrics = mgr.run_iteration_rl(i)
        dt = time.time() - t0
        rec = {"iteration": i, "seconds": round(dt, 1), **{
            k: (round(v, 5) if isinstance(v, float) else v)
            for k, v in metrics.items()
        }}
        with open(log_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(f"iteration {i}: {rec}", flush=True)
        if metrics.get("stopped"):
            break
        i += 1
    mgr.join_evaluation()
    print("done: last_checkpoint =", mgr.metadata["last_checkpoint"])


if __name__ == "__main__":
    main()
