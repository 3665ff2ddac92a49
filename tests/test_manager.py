"""TrainingManager RL-iteration smoke test: files, metadata, resume."""

import json
import os

import numpy as np
import pytest

from alphagomoku_tpu.game.types import GameRules
from alphagomoku_tpu.training.manager import ManagerConfig, TrainingManager


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("rlrun"))
    return ManagerConfig(
        working_dir=wd,
        rules=GameRules.FREESTYLE,
        rows=9,
        cols=9,
        architecture="FastPolicy",
        blocks=1,
        filters=16,
        games_per_iteration=8,
        selfplay_batch=8,
        num_simulations=8,
        train_steps_per_iteration=4,
        train_batch_size=32,
        seed=0,
    )


def test_rl_iteration_and_resume(tiny_cfg):
    mgr = TrainingManager(tiny_cfg)
    metrics = mgr.run_iteration_rl(0)
    assert metrics["samples"] > 20
    assert np.isfinite(metrics["total"])

    wd = tiny_cfg.working_dir
    assert os.path.exists(os.path.join(wd, "checkpoint", "network_0.msgpack"))
    assert os.path.exists(os.path.join(wd, "train_buffer", "buffer_0.npz"))
    assert os.path.exists(os.path.join(wd, "training_history.txt"))
    assert os.path.exists(os.path.join(wd, "buffer_stats.txt"))
    with open(os.path.join(wd, "metadata.json")) as fh:
        meta = json.load(fh)
    assert meta["last_checkpoint"] == 0
    assert meta["learning_steps"] == 4

    # a fresh manager resumes from the checkpoint and skips regeneration
    mgr2 = TrainingManager(tiny_cfg)
    assert mgr2.metadata["last_checkpoint"] == 0
    n = mgr2.generate_games(0)  # buffer_0 exists -> loaded, not regenerated
    assert n > 0
