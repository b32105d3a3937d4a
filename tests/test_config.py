"""Config system tests: group composition + overrides against the real
conf/ tree."""
import os

import pytest

from vsearch_tpu.config import load_config

ROOT = os.path.join(os.path.dirname(__file__), "..", "conf",
                    "train_ir_cfg.yaml")


def test_defaults_compose():
    cfg = load_config(ROOT)
    assert cfg["biencoder"]["encoder_q"]["type"] == "vdr"
    assert cfg["biencoder"]["encoder_q"]["shift_vocab_num"] == 999
    assert cfg["train"]["semi"] is True  # svdr_nq default
    assert cfg["train"]["batch_size"] == 32
    assert "nq_train" in cfg["data_stores"]
    assert cfg["seed"] == 12345


def test_group_swap_and_value_overrides():
    cfg = load_config(ROOT, ["biencoder=dpr", "train=vdr_nq",
                             "train.batch_size=64",
                             "train.learning_rate=1e-5",
                             "output_dir=/tmp/x",
                             "mesh.tp=2"])
    assert cfg["biencoder"]["encoder_q"]["type"] == "dpr"
    assert cfg["train"]["semi"] is False  # vdr_nq
    assert cfg["train"]["batch_size"] == 64
    assert cfg["train"]["learning_rate"] == 1e-5
    assert cfg["output_dir"] == "/tmp/x"
    assert cfg["mesh"]["tp"] == 2


def test_train_config_from_composed(tmp_path):
    from vsearch_tpu.train.trainer import TrainConfig

    cfg = load_config(ROOT, ["train.num_train_epochs=2"])
    tc = TrainConfig.from_dict({**cfg["train"], "seed": cfg["seed"],
                                "output_dir": str(tmp_path)})
    assert tc.num_train_epochs == 2
    assert tc.sym_loss is True
    assert tc.hard_negatives == 1


def test_all_conf_files_parse():
    import glob

    import yaml

    base = os.path.dirname(ROOT)
    files = glob.glob(os.path.join(base, "**", "*.yaml"), recursive=True)
    assert len(files) >= 10
    for f in files:
        with open(f) as fh:
            yaml.safe_load(fh)


def test_override_unknown_group_rejected(tmp_path):
    """A typo'd top-level override group must error instead of being
    silently dropped into an unused subtree (review finding, round 3;
    hydra parity)."""
    import yaml

    from vsearch_tpu.config import load_config

    root = tmp_path / "root.yaml"
    root.write_text(yaml.safe_dump({"train": {"batch_size": 8},
                                    "mesh": None}))
    with pytest.raises(KeyError, match="trian"):
        load_config(str(root), ["trian.batch_size=16"])
    # null intermediate nodes accept dotted overrides
    cfg = load_config(str(root), ["mesh.dp=4"])
    assert cfg["mesh"]["dp"] == 4
