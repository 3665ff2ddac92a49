"""Replay buffer, GSPRT, SPSA and match-evaluation tests."""

import math
import os

import numpy as np
import pytest

from alphagomoku_tpu.data import ReplayBuffer
from alphagomoku_tpu.eval import GSPRT, SPSA, elo_from_winrate


def fake_targets(n, h=9, w=9, seed=0):
    rng = np.random.default_rng(seed)
    pol = rng.random((n, h, w)).astype(np.float32)
    pol /= pol.sum((1, 2), keepdims=True)
    return {
        "board": rng.integers(0, 3, (n, h, w)).astype(np.int8),
        "stm": rng.integers(1, 3, n).astype(np.int8),
        "policy": pol,
        "value_wdl": np.eye(3, dtype=np.float32)[rng.integers(0, 3, n)],
        "q_value": rng.random((n, h, w, 2)).astype(np.float32) * 0.5,
        "q_mask": rng.random((n, h, w)) < 0.1,
        "root_value": rng.random((n, 2)).astype(np.float32) * 0.5,
        "moves_left": rng.integers(0, 80, n).astype(np.int32),
        "played_move": rng.integers(0, h * w, n).astype(np.int32),
        "valid": rng.random(n) < 0.8,
    }


def test_replay_add_sample():
    buf = ReplayBuffer(window_generations=3)
    for g in range(5):
        buf.add_generation(g, fake_targets(100, seed=g))
    # window keeps only the last 3 generations
    assert sorted(buf.generations) == [2, 3, 4]
    rng = np.random.default_rng(0)
    batch = buf.sample(64, rng)
    assert batch["board"].shape == (64, 9, 9)
    assert batch["valid"].all()
    st = buf.stats()
    assert st["samples"] == buf.num_samples > 0


def test_replay_values_sampler():
    buf = ReplayBuffer()
    buf.add_generation(0, fake_targets(200, seed=1))
    rng = np.random.default_rng(1)
    batch = buf.sample(32, rng, sampler="values")
    sums = batch["policy"].sum((1, 2))
    assert np.all(np.isfinite(batch["policy"]))
    assert ((sums > 0.99) & (sums < 1.01)).all()


def test_replay_persistence(tmp_path):
    buf = ReplayBuffer()
    buf.add_generation(7, fake_targets(50, seed=2))
    path = os.path.join(tmp_path, "buffer_7.npz")
    buf.save_generation(7, path)
    buf2 = ReplayBuffer()
    buf2.load_generation(7, path)
    np.testing.assert_array_equal(
        buf.generations[7]["board"], buf2.generations[7]["board"]
    )


def test_gsprt_accepts_strong_player():
    g = GSPRT(elo0=0.0, elo1=20.0)
    # A wins nearly every pair: pentanomial mass at 4 points
    status = -1
    for _ in range(200):
        status = g.add_result(4)
        if status != -1:
            break
    assert status == 1  # H1 accepted (A is stronger)


def test_gsprt_rejects_equal_player():
    g = GSPRT(elo0=0.0, elo1=20.0)
    status = -1
    # alternating wins/losses, mean exactly 0.5 -> no Elo gain
    seq = [0, 4, 2, 2, 1, 3] * 100
    for s in seq:
        status = g.add_result(s)
        if status != -1:
            break
    assert status == 0  # H0 accepted (not stronger)


def test_elo_from_winrate():
    assert abs(elo_from_winrate(0.5)) < 1e-9
    assert abs(elo_from_winrate(0.75) - 190.848) < 0.01  # known value
    assert elo_from_winrate(0.99) > 700


def test_spsa_minimizes_quadratic():
    # maximize f = -(x - 0.7)^2 (SPSA ascends the gradient of f)
    f = lambda t: -((t[0] - 0.7) ** 2)
    opt = SPSA(f, dim=1, seed=3)
    for _ in range(300):
        opt.do_one_step(300)
    assert abs(opt.theta[0] - 0.7) < 0.1


def test_spsa_save_load(tmp_path):
    opt = SPSA(lambda t: 0.0, dim=3, seed=0)
    opt.do_one_step(10)
    p = os.path.join(tmp_path, "spsa.json")
    opt.save(p)
    opt2 = SPSA(lambda t: 0.0, dim=3, seed=1)
    opt2.load(p)
    assert opt2.step == opt.step
    np.testing.assert_allclose(opt2.theta, opt.theta)
