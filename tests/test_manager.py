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
        leaf_solver="none",  # tiny CPU configs pin the fast settings the
        tree_reuse=False,    # production defaults now enable
        use_gating=False,
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


def test_round_snapshot_resume(tiny_cfg):
    """A finished selfplay round persists under saved_state/ and is reused
    on resume instead of being regenerated (reference: GeneratorManager
    state save/load)."""
    import numpy as np
    from alphagomoku_tpu.data.replay import FIELDS

    mgr = TrainingManager(tiny_cfg)
    wd = tiny_cfg.working_dir
    # fabricate a completed round snapshot for iteration 1
    gen_id = 1 * 1000 + 0
    part = os.path.join(wd, "saved_state", f"part_{gen_id}.npz")
    fake = {
        "board": np.zeros((5, 9, 9), np.int8),
        "stm": np.full(5, 1, np.int8),
        "policy": np.full((5, 9, 9), 1 / 81, np.float32),
        "value_wdl": np.tile(np.asarray([[1.0, 0, 0]], np.float32), (5, 1)),
        "q_value": np.zeros((5, 9, 9, 2), np.float32),
        "q_mask": np.zeros((5, 9, 9), bool),
        "root_value": np.zeros((5, 2), np.float32),
        "moves_left": np.zeros(5, np.int32),
        "played_move": np.zeros(5, np.int32),
    }
    np.savez_compressed(part.replace(".npz", ""), **fake)
    n = mgr.generate_games(1)
    assert n == 5  # snapshot consumed, nothing regenerated
    assert not os.path.exists(part)  # folded into the buffer file
    assert os.path.exists(os.path.join(wd, "train_buffer", "buffer_1.npz"))
