"""Render the flagship training run's evidence for the README: learning
curve (loss heads per iteration), gating ladder, and the multi-opponent
rating table + anchor Elo.

Usage: python tools/report_training.py --dir runs/flagship_r4
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="runs/flagship_r4")
    args = ap.parse_args()
    wd = args.dir

    log = os.path.join(wd, "flagship_run_log.jsonl")
    if os.path.exists(log):
        rows = [json.loads(l) for l in open(log)]
        print(f"iterations: {len(rows)}")
        keys = [k for k in ("total", "policy", "value", "valid_top1_accuracy",
                            "samples", "seconds", "score", "elo", "promoted")
                if rows and k in rows[0]]
        print("it  " + "  ".join(f"{k:>10}" for k in keys))
        for r in rows:
            print(f"{r['iteration']:>3} " + "  ".join(
                f"{r.get(k, ''):>10}" if not isinstance(r.get(k), float)
                else f"{r[k]:>10.4f}" for k in keys))

    hist = os.path.join(wd, "training_history.txt")
    if os.path.exists(hist):
        lines = open(hist).read().strip().splitlines()
        print(f"\ntraining_history.txt: {len(lines)} entries (head/tail):")
        for l in lines[:2] + (["..."] if len(lines) > 4 else []) + lines[-2:]:
            print(" ", l[:160])

    gate = os.path.join(wd, "gating.txt")
    if os.path.exists(gate):
        print("\ngating ladder:")
        for l in open(gate):
            print(" ", l.strip()[:160])

    rating = os.path.join(wd, "rating.txt")
    if os.path.exists(rating):
        print("\nrating.txt:")
        for l in open(rating):
            print(" ", l.strip()[:160])

    meta = os.path.join(wd, "metadata.json")
    if os.path.exists(meta):
        print("\nmetadata:", open(meta).read().strip())


if __name__ == "__main__":
    main()
