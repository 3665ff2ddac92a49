"""Differential parity fuzz: our host + jit rule/pattern paths vs the
REFERENCE implementation compiled into oracle/parity_oracle (VERDICT
round-1 task 5).

Checks per position:
  patterns  — per-cell 4-direction PatternType, both signs (host numpy path)
  threats   — per-cell ThreatType, both signs (host numpy path)
  outcome   — getOutcome after a probe move (host exact + jit outcome_after)
  forbidden — renju isForbidden per empty cell (host exact + jit
              forbidden_plane_u, whose bounded recursion now carries an
              exactness certificate + escalation pass,
              game/vectorized.py:is_forbidden_u)

BOTH host and jit paths must diverge ZERO times (the jit renju path's
certificate/escalation made it exact in round 4); the residual-uncertainty
certificate count is also reported and must stay zero.

Board sources: synthetic mix (sparse/dense/clustered/prefix/trajectory) or
--positions-npz with real selfplay positions (int8 boards [N, H, W]).

Usage: python tools/parity_fuzz.py [--boards 200] [--rules all] [--cpu]
       [--seed 0] [--report out.json] [--positions-npz file.npz]
Exit code 1 on any host OR jit divergence.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ORACLE = os.path.join(os.path.dirname(__file__), "..", "oracle", "parity_oracle")


class Oracle:
    def __init__(self, path: str = ORACLE):
        self.proc = subprocess.Popen(
            [path], stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True
        )

    def ask(self, line: str) -> str:
        self.proc.stdin.write(line + "\n")
        self.proc.stdin.flush()
        return self.proc.stdout.readline().strip()

    def set_rules(self, rules_name: str) -> None:
        assert self.ask(f"rules {rules_name}") == "ok"

    def set_board(self, board) -> None:
        h, w = board.shape
        cells = "".join("_XO|"[int(v) if int(v) >= 0 else 3] for v in board.flat)
        assert self.ask(f"board {h} {w} {cells}") == "ok"

    def outcome(self, r: int, c: int, sign: str) -> int:
        return int(self.ask(f"outcome {r} {c} {sign}"))

    def forbidden(self, r: int, c: int) -> bool:
        return self.ask(f"forbidden {r} {c}") == "1"

    def planes(self, h: int, w: int):
        import numpy as np

        vals = [int(x) for x in self.ask("threats").split()]
        tt = np.asarray(vals, np.int8).reshape(2, h, w)
        pats, ho3s = [], []
        for s in ("X", "O"):
            vals = [int(x) for x in self.ask(f"patterns {s}").split()]
            pats.append(np.asarray(vals, np.int8).reshape(h, w, 4))
            vals = [int(x) for x in self.ask(f"ho3 {s}").split()]
            ho3s.append(np.asarray(vals, bool).reshape(h, w, 4))
        return tt, pats[0], pats[1], ho3s[0], ho3s[1]

    def close(self):
        try:
            self.ask("quit")
        except Exception:
            pass
        self.proc.terminate()


def gen_boards(rng, n, h, w, rules=None):
    """Mix of sparse, dense, clustered (fork-heavy), game-prefix, and
    game-trajectory boards."""
    import numpy as np

    out = []
    for i in range(n):
        b = np.zeros((h, w), np.int8)
        kind = i % 5
        if kind == 0:  # sparse random
            stones = int(rng.integers(2, 12))
            cells = rng.choice(h * w, stones, replace=False)
            b.flat[cells] = np.where(np.arange(stones) % 2 == 0, 1, 2)
        elif kind == 1:  # dense random
            stones = int(rng.integers(h * w // 4, h * w // 2))
            cells = rng.choice(h * w, stones, replace=False)
            b.flat[cells] = np.where(np.arange(stones) % 2 == 0, 1, 2)
        elif kind == 2:  # clustered: adversarial for fork logic
            stones = int(rng.integers(10, 22))
            r0, c0 = rng.integers(2, h - 2), rng.integers(2, w - 2)
            placed = 0
            while placed < stones:
                r = int(np.clip(r0 + rng.integers(-4, 5), 0, h - 1))
                c = int(np.clip(c0 + rng.integers(-4, 5), 0, w - 1))
                if b[r, c] == 0:
                    # bias 2:1 toward black: renju fork shapes are black's
                    b[r, c] = 1 if rng.random() < 0.67 else 2
                    placed += 1
        elif kind == 3:  # alternating game prefix (legal-ish, balanced)
            stones = int(rng.integers(8, 40))
            cells = rng.choice(h * w, stones, replace=False)
            b.flat[cells] = np.where(np.arange(stones) % 2 == 0, 1, 2)
        else:  # game trajectory: alternating adjacency-biased legal play,
            # stopped before any five — the texture selfplay produces
            b = gen_traj_board(rng, h, w, rules)
        out.append(b)
    return out


def gen_traj_board(rng, h, w, rules=None):
    """One position sampled from an adjacency-biased legal game."""
    import numpy as np

    from alphagomoku_tpu.game.types import GameRules, Move, GameOutcome
    from alphagomoku_tpu.game import rules as R

    rules = rules or GameRules.FREESTYLE
    b = np.zeros((h, w), np.int8)
    b[h // 2 + int(rng.integers(-2, 3)), w // 2 + int(rng.integers(-2, 3))] = 1
    target = int(rng.integers(6, 56))
    sign = 2
    for _ in range(target):
        occ = np.argwhere(b != 0)
        if rng.random() < 0.9 and len(occ):
            # play near an existing stone (selfplay locality)
            for _try in range(20):
                r0, c0 = occ[rng.integers(len(occ))]
                r = int(np.clip(r0 + rng.integers(-2, 3), 0, h - 1))
                c = int(np.clip(c0 + rng.integers(-2, 3), 0, w - 1))
                if b[r, c] == 0:
                    break
            else:
                break
        else:
            empties = np.argwhere(b == 0)
            if not len(empties):
                break
            r, c = empties[rng.integers(len(empties))]
        b[r, c] = sign
        out = R.get_outcome(rules, b, Move(row=int(r), col=int(c), sign=int(sign)))
        if out != GameOutcome.UNKNOWN:
            b[r, c] = 0  # keep the position live
            break
        sign = 3 - sign
    return b


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--boards", type=int, default=200)
    p.add_argument("--rules", default="all")
    p.add_argument("--size", type=int, default=15)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--report", default=None)
    p.add_argument("--skip-jit", action="store_true",
                   help="host-vs-oracle only (no jax)")
    p.add_argument("--positions-npz", default=None,
                   help="npz with 'boards' int8 [N,H,W] (e.g. dumped from "
                        "selfplay) — replaces synthetic board generation")
    p.add_argument("--only", default=None, choices=[None, "forbidden"],
                   help="restrict to one check (forbidden: the renju "
                        "exactness leg over large selfplay corpora)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from alphagomoku_tpu.game.types import GameRules, Move, CROSS, CIRCLE, NONE
    from alphagomoku_tpu.game import rules as R
    from alphagomoku_tpu.patterns import host as H

    rule_list = (
        [r for r in GameRules]
        if args.rules == "all"
        else [GameRules[args.rules]]
    )
    h = w = args.size
    rng = np.random.default_rng(args.seed)
    oracle = Oracle()
    stats = {
        "boards": 0,
        "pattern_cells": 0, "pattern_div": 0,
        "threat_cells": 0, "threat_div": 0,
        "outcome_checks": 0, "outcome_div_host": 0, "outcome_div_jit": 0,
        "forbidden_cells": 0, "forbidden_div_host": 0, "forbidden_div_jit": 0,
        "forbidden_uncertain_jit": 0,
    }
    failures = []

    if not args.skip_jit:
        import jax
        import jax.numpy as jnp

        from alphagomoku_tpu.game import vectorized as V

        jit_tables = {r: V.device_tables(r) for r in rule_list}
        fplane = {
            r: jax.jit(lambda b, _t=jit_tables[r]: V.forbidden_plane_u(_t, b))
            for r in rule_list
        }

        def jit_outcome(r, board, pr, pc_, sign):
            t = jit_tables[r]
            b2 = board.copy()
            b2[pr, pc_] = sign
            mc = int((b2 != 0).sum())
            out = V.outcome_after(
                t, jnp.asarray(b2[None]), jnp.full(1, pr), jnp.full(1, pc_),
                jnp.full(1, sign, jnp.int8), jnp.full(1, mc, jnp.int32), h * w)
            return int(np.asarray(out)[0])

    npz_boards = None
    if args.positions_npz:
        npz_boards = np.load(args.positions_npz)["boards"].astype(np.int8)
        h, w = npz_boards.shape[1:3]

    for rules in rule_list:
        oracle.set_rules(rules.name)
        if npz_boards is not None:
            boards = list(npz_boards)
        else:
            boards = gen_boards(rng, args.boards, h, w, rules)
        for b in boards:
            stats["boards"] += 1
            oracle.set_board(b)
            if args.only == "forbidden":
                if rules != GameRules.RENJU:
                    continue
                empty = b == NONE
                empties = np.argwhere(empty)
                ref_forb = np.zeros((h, w), bool)
                for pr, pc_ in empties:
                    ref_forb[pr, pc_] = oracle.forbidden(int(pr), int(pc_))
                host_forb = np.zeros((h, w), bool)
                for pr, pc_ in empties:
                    host_forb[pr, pc_] = R.is_forbidden(
                        b, Move(row=int(pr), col=int(pc_), sign=CROSS))
                stats["forbidden_cells"] += len(empties)
                dh = (ref_forb != host_forb) & empty
                if dh.any():
                    stats["forbidden_div_host"] += int(dh.sum())
                    failures.append(("forbidden_host", b.tolist()))
                if not args.skip_jit:
                    jf_, junc_ = fplane[rules](jnp.asarray(b[None]))
                    jf = np.asarray(jf_)[0]
                    dj = (ref_forb != jf) & empty
                    if dj.any():
                        failures.append(("forbidden_jit", b.tolist()))
                    stats["forbidden_div_jit"] += int(dj.sum())
                    stats["forbidden_uncertain_jit"] += int(np.asarray(junc_).sum())
                continue
            ref_tt, ref_px, ref_po, ref_h3x, ref_h3o = oracle.planes(h, w)
            ana = H.analyze(b, rules)
            empty = b == NONE

            # pattern parity on empty cells (occupied cells are never
            # queried by any consumer).  Representation note: the reference
            # DEMOTES half-open threes to NONE in the main table and keeps
            # them in a separate bitset (PatternTable.cpp:172-193); we keep
            # them in the main nibble — compare modulo that mapping, and
            # check our HO3 info against the reference bitset directly.
            PT_HO3, TT_HO3 = 1, 1
            for sign, ref_p, ref_h3 in (
                (CROSS, ref_px, ref_h3x), (CIRCLE, ref_po, ref_h3o)):
                ours = np.moveaxis(ana.pt[sign], 0, -1)  # [H, W, 4]
                ours_main = np.where(ours == PT_HO3, 0, ours)
                m = empty[..., None] & (ours_main != ref_p)
                m_h3 = empty[..., None] & ((ours == PT_HO3) != ref_h3)
                stats["pattern_cells"] += int(empty.sum()) * 8
                if m.any() or m_h3.any():
                    stats["pattern_div"] += int(m.sum()) + int(m_h3.sum())
                    failures.append(("pattern", rules.name, b.tolist()))
            for sign, col in ((CROSS, 0), (CIRCLE, 1)):
                ours_tt = np.where(
                    ana.tt[sign] == TT_HO3, 0, ana.tt[sign])
                m = empty & (ours_tt != ref_tt[col])
                stats["threat_cells"] += int(empty.sum())
                if m.any():
                    stats["threat_div"] += int(m.sum())
                    failures.append(("threat", rules.name, b.tolist()))

            # outcome parity on sampled probe moves
            empties = np.argwhere(empty)
            if len(empties):
                probes = empties[rng.choice(len(empties), min(8, len(empties)),
                                            replace=False)]
                for pr, pc_ in probes:
                    for sign, sname in ((CROSS, "X"), (CIRCLE, "O")):
                        ref_out = oracle.outcome(int(pr), int(pc_), sname)
                        b2 = b.copy()
                        b2[pr, pc_] = sign
                        host_out = int(R.get_outcome(
                            rules, b2, Move(row=int(pr), col=int(pc_), sign=sign)))
                        stats["outcome_checks"] += 1
                        if host_out != ref_out:
                            stats["outcome_div_host"] += 1
                            failures.append(
                                ("outcome_host", rules.name, int(pr), int(pc_),
                                 sname, host_out, ref_out, b.tolist()))
                        if not args.skip_jit:
                            jout = jit_outcome(rules, b, int(pr), int(pc_), sign)
                            stats["outcome_checks"] += 0
                            if jout != ref_out:
                                stats["outcome_div_jit"] += 1

            # renju forbidden parity over ALL empty cells
            if rules == GameRules.RENJU:
                ref_forb = np.zeros((h, w), bool)
                for pr, pc_ in empties:
                    ref_forb[pr, pc_] = oracle.forbidden(int(pr), int(pc_))
                host_forb = np.zeros((h, w), bool)
                for pr, pc_ in empties:
                    host_forb[pr, pc_] = R.is_forbidden(
                        b, Move(row=int(pr), col=int(pc_), sign=CROSS))
                stats["forbidden_cells"] += len(empties)
                dh = (ref_forb != host_forb) & empty
                if dh.any():
                    stats["forbidden_div_host"] += int(dh.sum())
                    failures.append(("forbidden_host", b.tolist()))
                if not args.skip_jit:
                    jf_, junc_ = fplane[rules](jnp.asarray(b[None]))
                    jf = np.asarray(jf_)[0]
                    dj = (ref_forb != jf) & empty
                    if dj.any():
                        failures.append(("forbidden_jit", b.tolist()))
                    stats["forbidden_div_jit"] += int(dj.sum())
                    stats["forbidden_uncertain_jit"] += int(np.asarray(junc_).sum())

    oracle.close()
    host_div = (
        stats["pattern_div"] + stats["threat_div"]
        + stats["outcome_div_host"] + stats["forbidden_div_host"]
    )
    jit_div = stats["outcome_div_jit"] + stats["forbidden_div_jit"]
    stats["host_divergence_total"] = host_div
    stats["jit_divergence_total"] = jit_div
    print(json.dumps(stats, indent=1))
    if args.report:
        with open(args.report, "w") as fh:
            json.dump({"stats": stats, "failures": failures[:20]}, fh, indent=1)
    if failures:
        for f in failures[:5]:
            print("FAIL:", f[0], f[1], file=sys.stderr)
    return 1 if (host_div or jit_div) else 0


if __name__ == "__main__":
    sys.exit(main())
