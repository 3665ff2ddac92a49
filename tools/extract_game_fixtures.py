"""Extract golden game-rule positions from the reference GoogleTest sources.

The reference validates its rules engine with ASCII-board golden tests
(reference: test/game/test_{freestyle,standard,caro,renju}.cpp).  Those
boards + assertions are *data*; this tool parses them into
tests/fixtures/game_golden.json so our pytest suite replays the exact same
cases against the new engine.

Each fixture is {"name", "ops": [...]} where ops are, in order:
  ["board", <ascii rows string>]          set the board
  ["add", "Xa0"] / ["undo", "Xa0"]        mutate the board
  ["outcome", "RENJU", "Xa0", "CROSS_WIN"]   assert get_outcome
  ["forbidden", "Xd5", true]              assert renju is_forbidden
"""

from __future__ import annotations

import json
import os
import re
import sys

REF = "/root/reference/test/game"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "game_golden.json")

BOARD_RE = re.compile(r'"((?: [!_?XO])+ ?\\n)"')
ROW_RE = re.compile(r'"\s*((?:[!_?XO]\s)+[!_?XO]?)\s*\\n"')
TEST_RE = re.compile(r"TEST(?:_F)?\((\w+),\s*(\w+)\)")
OUTCOME_RE = re.compile(
    r'EXPECT_EQ\(getOutcome\(GameRules::(\w+),\s*board,\s*Move\("([^"]+)"\)\),\s*GameOutcome::(\w+)\)'
)
FORBID_RE = re.compile(r'EXPECT_(TRUE|FALSE)\(is_forbidden\(Move\("([^"]+)"\)\)\)')
ADD_RE = re.compile(r'(add_move|undo_move)\(Move\("([^"]+)"\)\)')
SETBOARD_RE = re.compile(r"(set_board\(|Board::fromString\()")


def parse_file(path: str) -> list[dict]:
    src = open(path).read()
    fixtures = []
    tests = list(TEST_RE.finditer(src))
    for i, m in enumerate(tests):
        body_start = m.end()
        body_end = tests[i + 1].start() if i + 1 < len(tests) else len(src)
        body = src[body_start:body_end]
        name = f"{m.group(1)}.{m.group(2)}"
        ops = []
        # walk the body in source order, collecting board strings + assertions
        events = []
        for mm in SETBOARD_RE.finditer(body):
            # collect consecutive quoted rows after the call site
            rows = []
            for rm in ROW_RE.finditer(body, mm.end()):
                if rows and rm.start() > end + 80:
                    break
                if not rows and rm.start() > mm.end() + 400:
                    break
                rows.append(rm.group(1))
                end = rm.end()
            if rows:
                events.append((mm.start(), ["board", "\n".join(rows)]))
        for mm in OUTCOME_RE.finditer(body):
            events.append((mm.start(), ["outcome", mm.group(1), mm.group(2), mm.group(3)]))
        for mm in FORBID_RE.finditer(body):
            events.append((mm.start(), ["forbidden", mm.group(2), mm.group(1) == "TRUE"]))
        for mm in ADD_RE.finditer(body):
            events.append((mm.start(), ["add" if mm.group(1) == "add_move" else "undo", mm.group(2)]))
        events.sort(key=lambda e: e[0])
        ops = [e[1] for e in events]
        if any(op[0] in ("outcome", "forbidden") for op in ops):
            fixtures.append({"name": name, "ops": ops})
    return fixtures


def main() -> None:
    fixtures = []
    for f in ["test_freestyle.cpp", "test_standard.cpp", "test_caro.cpp", "test_renju.cpp"]:
        fixtures.extend(parse_file(os.path.join(REF, f)))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(fixtures, fh, indent=1)
    n_asserts = sum(
        1 for fx in fixtures for op in fx["ops"] if op[0] in ("outcome", "forbidden")
    )
    print(f"wrote {len(fixtures)} fixtures, {n_asserts} assertions -> {OUT}")


if __name__ == "__main__":
    sys.exit(main())
