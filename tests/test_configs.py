"""Config JSON round-trip tests (reference: test/utils/test_configs.cpp)."""

import os

import pytest

from alphagomoku_tpu.search.mcts import MCTSConfig
from alphagomoku_tpu.selfplay.selfplay import SelfplayConfig
from alphagomoku_tpu.training.train import TrainConfig
from alphagomoku_tpu.utils import configs as C


@pytest.mark.parametrize("cls", [MCTSConfig, SelfplayConfig, TrainConfig])
def test_round_trip(cls):
    cfg = cls()
    d = C.to_dict(cfg)
    back = C.from_dict(cls, d)
    for k, v in d.items():
        assert getattr(back, k) == v


def test_round_trip_with_overrides():
    cfg = MCTSConfig(max_nodes=512, exploration_constant=2.0, leaf_batch=4)
    back = C.from_dict(MCTSConfig, C.to_dict(cfg))
    assert back.max_nodes == 512
    assert back.exploration_constant == 2.0
    assert back.leaf_batch == 4


def test_unknown_keys_ignored_and_defaults_filled():
    back = C.from_dict(MCTSConfig, {"max_nodes": 7, "bogus_key": 1})
    assert back.max_nodes == 7
    assert back.max_edges == MCTSConfig().max_edges


def test_master_config_create_and_version_check(tmp_path):
    path = os.path.join(tmp_path, "config.json")
    cfg = C.load_master_config(path)  # auto-created
    assert os.path.exists(path)
    assert cfg["version"] == C.CONFIG_VERSION
    assert cfg["search"]["max_children" if "max_children" in cfg["search"] else "max_edges"]
    # tampered version must be rejected
    cfg["version"] = "0.0"
    C.save_master_config(cfg, path)
    with pytest.raises(ValueError, match="version mismatch"):
        C.load_master_config(path)
