"""Runtime self-verification: subprocess-isolated environment checks.

Counterpart of the reference's --selfcheck
(reference: src/utils/selfcheck.cpp:63-120, invoked from
ProgramManager.cpp:355-375): each check runs in a forked subprocess with
captured output, so a crashing backend cannot take down the engine process
and the user gets a per-check PASS/FAIL report.

Checks: JAX backend + device, pattern-table construction (content hash),
rules-engine golden positions, network forward (finite outputs), and a
tactical search (must find a win-in-1)."""

from __future__ import annotations

import multiprocessing as mp
import traceback
from typing import Callable


def _check_backend() -> str:
    import jax

    devs = jax.devices()
    assert len(devs) >= 1
    import jax.numpy as jnp

    x = (jnp.arange(8) * 2).sum()
    assert int(x) == 56
    return f"devices: {devs}"


def _pin_cpu() -> None:
    """Isolated numeric checks run on the CPU backend: the parent process
    owns the (possibly exclusive, tunneled) accelerator client, so a child
    grabbing the same device can block; CPU still exercises the full code
    path.  jax.config must be set (the env var loses to a preregistered
    TPU plugin)."""
    import jax

    jax.config.update("jax_platforms", "cpu")


def _check_pattern_tables() -> str:
    import hashlib

    import numpy as np

    from ..game.types import GameRules
    from ..patterns import tables as T

    digests = []
    for rules in GameRules:
        pat, thr = T.get_tables(rules)
        assert pat.shape == (T.NUM_PATTERNS,) and thr.shape == (8**4,)
        digests.append(hashlib.sha1(pat.tobytes() + thr.tobytes()).hexdigest()[:8])
    return "table digests: " + " ".join(digests)


def _check_rules() -> str:
    import numpy as np

    from ..game import board as board_mod
    from ..game.rules import get_outcome
    from ..game.types import CROSS, GameOutcome, GameRules, Move

    board = np.zeros((15, 15), np.int8)
    board[7, 3:8] = CROSS
    out = get_outcome(GameRules.FREESTYLE, board, Move(row=7, col=7, sign=CROSS))
    assert out == GameOutcome.CROSS_WIN, out
    return "five-in-a-row detected"


def _check_network() -> str:
    _pin_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import create_network

    net = create_network("ConvNextPVQMraw", blocks=1, filters=16)
    x = jnp.zeros((2, 15, 15, net.cfg.input_planes), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(leaf, np.float32)).all(), "non-finite output"
    return "forward pass finite"


def _check_search() -> str:
    _pin_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..game import vectorized as V
    from ..game.types import CROSS, GameRules
    from ..models import create_network
    from ..search import mcts

    tables = V.device_tables(GameRules.FREESTYLE)
    net = create_network("FastPolicy", blocks=1, filters=8)
    x = jnp.zeros((1, 9, 9, net.cfg.input_planes), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    board = np.zeros((1, 9, 9), np.int8)
    board[0, 4, 2:6] = CROSS  # four in a row, both ends open
    cfg = mcts.MCTSConfig(max_nodes=24, max_edges=81, max_depth=8)
    state = mcts.run_search(
        lambda v, p: net.apply(v, p, train=False),
        variables,
        tables,
        cfg,
        jnp.asarray(board),
        jnp.full((1,), CROSS, jnp.int8),
        16,
    )
    mv = int(np.asarray(mcts.select_move(state))[0])
    assert (mv // 9, mv % 9) in [(4, 1), (4, 6)], f"bad move {mv}"
    return "win-in-1 found"


CHECKS: list[tuple[str, Callable[[], str]]] = [
    ("jax backend", _check_backend),
    ("pattern tables", _check_pattern_tables),
    ("rules engine", _check_rules),
    ("network", _check_network),
    ("search", _check_search),
]


def _run_in_subprocess(fn: Callable[[], str], queue) -> None:
    try:
        queue.put(("ok", fn()))
    except Exception:
        queue.put(("fail", traceback.format_exc()))


def run_selfcheck(isolate: bool = True, timeout: float = 300.0) -> bool:
    """Run every check; True if all pass.  isolate=True runs each check in
    its own SPAWNED subprocess with captured output (the re-design of the
    reference's fork+pipe isolation, selfcheck.cpp:63-120: fork is
    incompatible with an initialized multithreaded JAX runtime — a forked
    child's first backend call deadlocks — so isolation uses spawn, and
    the backend/device check runs IN-PROCESS because this process owns the
    device client the engine will actually use)."""
    ctx = mp.get_context("spawn")
    all_ok = True
    for name, fn in CHECKS:
        if name == "jax backend":
            # the parent's own runtime is the thing under test here
            try:
                status, detail = "ok", fn()
            except Exception:
                status, detail = "fail", traceback.format_exc()
            mark = "PASS" if status == "ok" else "FAIL"
            print(f"[{mark}] {name}: {detail.splitlines()[-1] if detail else ''}")
            all_ok &= status == "ok"
            continue
        if isolate:
            q = ctx.Queue()
            p = ctx.Process(target=_run_in_subprocess, args=(fn, q))
            p.start()
            p.join(timeout)
            if p.is_alive():
                p.terminate()
                status, detail = "fail", "timeout"
            elif q.empty():
                status, detail = "fail", f"crashed (exit {p.exitcode})"
            else:
                status, detail = q.get()
        else:
            try:
                status, detail = "ok", fn()
            except Exception:
                status, detail = "fail", traceback.format_exc()
        mark = "PASS" if status == "ok" else "FAIL"
        print(f"[{mark}] {name}: {detail.splitlines()[-1] if detail else ''}")
        all_ok &= status == "ok"
    return all_ok


if __name__ == "__main__":
    import sys

    sys.exit(0 if run_selfcheck() else 1)
