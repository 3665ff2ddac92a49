"""Micro-benchmarks of the hot step components, one subprocess per
measurement (sequential large recompiles in one process can fault the
device — see NEXT.md perf lore).

Usage: python tools/microbench.py [name ...]   (default: all)
Each prints one JSON line {"name", "ms"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CASES = {
    "freestyle_encode": ("FREESTYLE", "encode"),
    "renju_encode": ("RENJU", "encode"),
    "freestyle_outcome": ("FREESTYLE", "outcome"),
    "renju_outcome": ("RENJU", "outcome"),
    "renju_forbidden_plane": ("RENJU", "forbidden"),
    "freestyle_net": ("FREESTYLE", "net"),
    "freestyle_vcf16": ("FREESTYLE", "vcf16"),
    "freestyle_vct16": ("FREESTYLE", "vct16"),
    "renju_vct16": ("RENJU", "vct16"),
}

_BODY = r"""
import time, sys, json
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from alphagomoku_tpu.game.types import GameRules, CROSS, CIRCLE
from alphagomoku_tpu.game import vectorized as V

RULES = GameRules.{rules}
KIND = {kind!r}
B, S = {batch}, 15
rng = np.random.default_rng(0)
boards = np.zeros((B, S, S), np.int8)
for b in range(B):
    n = rng.integers(6, 30)
    cells = rng.choice(S * S, size=n, replace=False)
    boards[b].flat[cells] = np.where(np.arange(n) % 2 == 0, CROSS, CIRCLE)
boards = jnp.asarray(boards)
stm = jnp.full(B, CROSS, jnp.int8)
rows = jnp.asarray(rng.integers(0, S, B))
cols = jnp.asarray(rng.integers(0, S, B))
tables = V.device_tables(RULES)

if KIND == "encode":
    from alphagomoku_tpu.patterns import features as F
    fn = jax.jit(lambda b, s: F.encode(tables, b, s))
    args = (boards, stm)
elif KIND == "outcome":
    fn = jax.jit(lambda b, r, c, s: V.outcome_after(
        tables, b, r, c, s, jnp.full(B, 10, jnp.int32), S * S))
    args = (boards, rows, cols, stm)
elif KIND == "forbidden":
    fn = jax.jit(lambda b: V.forbidden_plane(tables, b))
    args = (boards,)
elif KIND == "net":
    from alphagomoku_tpu.models import create_network
    net = create_network("ConvNextPVQMraw", blocks=6, filters=64)
    x = jnp.zeros((B, S, S, net.cfg.input_planes), jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    fn = jax.jit(lambda v, p: net.apply(v, p, train=False).policy_logits)
    args = (variables, x)
elif KIND == "vcf16":
    from alphagomoku_tpu.search import vcf
    fn = jax.jit(lambda b, s: vcf.solve(tables, b, s, max_depth=6, max_steps=16))
    args = (boards, stm)
elif KIND == "vct16":
    from alphagomoku_tpu.search import vct_batched
    fn = jax.jit(lambda b, s: vct_batched.solve(
        tables, b, s, max_depth=6, max_steps=16, max_threes=2))
    args = (boards, stm)

r = fn(*args)
jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(10):
    r = fn(*args)
jax.block_until_ready(r)
dt = (time.perf_counter() - t0) / 10
print(json.dumps({{"name": {name!r}, "ms": round(dt * 1000, 3)}}), flush=True)
"""


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = 1024
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
    names = args or list(CASES)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    for name in names:
        rules, kind = CASES[name]
        code = _BODY.format(rules=rules, kind=kind, name=name, batch=batch)
        subprocess.run([sys.executable, "-c", code], env=env, timeout=1200)


if __name__ == "__main__":
    main()
