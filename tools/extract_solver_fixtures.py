"""Extract the move-generator golden positions from the reference tests.

The reference validates its staged tactical move generator with ASCII-board
golden tests (reference: test/search/alpha_beta/test_move_generator.cpp,
~37 active cases).  Those boards + assertions are data; this tool parses
them into tests/fixtures/solver_golden.json so our pytest suite replays the
exact cases against search/move_generator.py.

Each fixture is {"name", "board": <ascii rows>, "runs": [...]}; a run is
{"rules", "stm", "mode", "asserts": [...]} with asserts among:
  ["must_defend", bool]        ["has_initiative", bool]
  ["size", "eq"|"ge", N]       ["contains", true|false, "Xa4"]
  ["score_of", "Xa4", "loss_in", 1]
  ["equals", <run index>]      (same move set as an earlier run)
"""

from __future__ import annotations

import json
import os
import re
import sys

SRC = "/root/reference/test/search/alpha_beta/test_move_generator.cpp"
OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "solver_golden.json"
)

TEST_RE = re.compile(r"\n\tTEST\((\w+),\s*(\w+)\)")
ROW_RE = re.compile(r'"\s*((?:[!_?XO]\s)+[!_?XO]?)\s*\\n"')
WRAPPER_RE = re.compile(
    r"MoveGenWrapper\s+(\w+)\(GameRules::(\w+),\s*board,\s*Sign::(\w+)\)"
)
RUN_RE = re.compile(
    r"const ActionList (\w+)\s*=\s*(\w+)\(MoveGeneratorMode::(\w+)\)"
)
FLAG_RE = re.compile(r"EXPECT_(TRUE|FALSE)\((\w+)\.(must_defend|has_initiative)\)")
SIZE_RE = re.compile(r"EXPECT_(EQ|GE)\((\w+)\.size\(\),\s*(\d+)\)")
CONTAINS_RE = re.compile(r'EXPECT_(TRUE|FALSE)\((\w+)\.contains\(Move\("([^"]+)"\)\)\)')
SCORE_RE = re.compile(
    r'EXPECT_EQ\((\w+)\.getScoreOf\(Move\("([^"]+)"\)\),\s*Score::(\w+)\((\d+)\)\)'
)
EQUALS_RE = re.compile(r"EXPECT_TRUE\((\w+)\.equals\((\w+)\)\)")


def parse() -> list[dict]:
    src = open(SRC).read()
    # drop //-commented lines (disabled placeholder tests contain board rows)
    src = "\n".join(l for l in src.split("\n") if not l.lstrip().startswith("//"))
    fixtures = []
    tests = list(TEST_RE.finditer(src))
    for i, m in enumerate(tests):
        body = src[m.end() : tests[i + 1].start() if i + 1 < len(tests) else len(src)]
        rows = [rm.group(1) for rm in ROW_RE.finditer(body)]
        if not rows:
            continue
        wrappers = {
            wm.group(1): (wm.group(2), wm.group(3))
            for wm in WRAPPER_RE.finditer(body)
        }
        runs: list[dict] = []
        run_of_var: dict[str, int] = {}
        events: list[tuple[int, str, tuple]] = []
        for rm in RUN_RE.finditer(body):
            events.append((rm.start(), "run", (rm.group(1), rm.group(2), rm.group(3))))
        for am in FLAG_RE.finditer(body):
            events.append(
                (am.start(), "assert",
                 (am.group(2), [am.group(3), am.group(1) == "TRUE"]))
            )
        for am in SIZE_RE.finditer(body):
            events.append(
                (am.start(), "assert",
                 (am.group(2), ["size", am.group(1).lower(), int(am.group(3))]))
            )
        for am in CONTAINS_RE.finditer(body):
            events.append(
                (am.start(), "assert",
                 (am.group(2), ["contains", am.group(1) == "TRUE", am.group(3)]))
            )
        for am in SCORE_RE.finditer(body):
            events.append(
                (am.start(), "assert",
                 (am.group(1), ["score_of", am.group(2), am.group(3), int(am.group(4))]))
            )
        for am in EQUALS_RE.finditer(body):
            events.append(
                (am.start(), "assert", (am.group(1), ["equals_var", am.group(2)]))
            )
        events.sort(key=lambda e: e[0])
        for _, kind, payload in events:
            if kind == "run":
                var, wrapper, mode = payload
                rules, stm = wrappers[wrapper]
                run_of_var[var] = len(runs)
                runs.append(
                    {"rules": rules, "stm": stm, "mode": mode.lower(), "asserts": []}
                )
            else:
                var, a = payload
                if var not in run_of_var:
                    continue
                if a[0] == "equals_var":
                    if a[1] not in run_of_var:
                        continue
                    # attach to the later of the two runs so the earlier
                    # result already exists when the test replays in order
                    i, j = run_of_var[var], run_of_var[a[1]]
                    runs[max(i, j)]["asserts"].append(["equals", min(i, j)])
                    continue
                runs[run_of_var[var]]["asserts"].append(a)
        # keep assert-less runs: `equals` asserts reference them by index
        if any(r["asserts"] for r in runs):
            fixtures.append(
                {"name": f"{m.group(1)}.{m.group(2)}", "board": "\n".join(rows),
                 "runs": runs}
            )
    return fixtures


def main() -> None:
    fixtures = parse()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(fixtures, fh, indent=1)
    n = sum(len(r["asserts"]) for fx in fixtures for r in fx["runs"])
    print(f"wrote {len(fixtures)} fixtures, {n} assertions -> {OUT}")


if __name__ == "__main__":
    sys.exit(main())
