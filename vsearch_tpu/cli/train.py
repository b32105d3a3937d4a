"""Training CLI: the counterpart of the reference's ``train_ir.py``.

Usage:
  python -m vsearch_tpu.cli.train --config conf/train_ir_cfg.yaml \
      train_datasets=[nq_train] train.batch_size=64 biencoder=dpr

No torchrun/NCCL: parallelism comes from the JAX mesh (config ``mesh.dp``
/ ``mesh.tp``); multi-host launches run this once per host with
COORDINATOR_ADDRESS / WORLD_SIZE / RANK env vars set (or MASTER_ADDR /
MASTER_PORT, torchrun-style) — ``initialize_distributed`` picks them up
before the backend comes up.
"""
from __future__ import annotations

import argparse
import logging
import random

import numpy as np

from ..config import load_config

logger = logging.getLogger("vsearch_tpu.cli.train")


def set_seed(seed: int):
    """reference conf_utils.py:10-16 (no torch/cuda legs needed)."""
    random.seed(seed)
    np.random.seed(seed)


def build_datasets(cfg, names):
    from ..data import BiEncoderDataset

    datasets = []
    for name in names or []:
        spec = cfg["data_stores"][name]
        datasets.append(BiEncoderDataset(
            file=spec["file"],
            shuffle_positives=spec.get("shuffle_positives", False),
            download_link=spec.get("download_link")))
    return datasets


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(name)s: "
                               "%(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="conf/train_ir_cfg.yaml")
    ap.add_argument("overrides", nargs="*",
                    help="dotted key=value overrides / group swaps")
    args = ap.parse_args(argv)
    cfg = load_config(args.config, args.overrides)

    # multi-host bring-up first — before anything touches the backend
    # (counterpart of reference conf_utils.py:19-49 setup_cfg_gpu)
    from ..parallel.collectives import initialize_distributed

    if initialize_distributed():
        import jax

        logger.info("distributed: process %d/%d, %d global devices",
                    jax.process_index(), jax.process_count(),
                    len(jax.devices()))

    seed = int(cfg.get("seed", 12345))
    set_seed(seed)

    from ..retriever import Retriever, RetrieverConfig
    from ..train.trainer import RetrieverTrainer, TrainConfig

    if cfg.get("model_path"):
        logger.info("loading checkpoint from %s", cfg["model_path"])
        retriever = Retriever.from_pretrained(cfg["model_path"])
    else:
        retriever = Retriever(
            RetrieverConfig.from_dict(cfg["biencoder"]))

    # optional live index for retrieved-negative mining
    if cfg.get("index") and cfg.get("index_stores"):
        spec = cfg["index_stores"][cfg["index"]]
        retriever.load_index(index_file=spec["index_file"],
                             data_file=spec.get("data_file"),
                             index_type=spec.get("index_type"))

    train_cfg = TrainConfig.from_dict({
        **cfg.get("train", {}),
        "seed": seed,
        "output_dir": cfg.get("output_dir", "./output"),
        "save_name_prefix": cfg.get("save_name_prefix", "checkpoint"),
    })

    mesh = None
    mesh_cfg = cfg.get("mesh") or {}
    import jax

    if len(jax.devices()) > 1 or (mesh_cfg.get("tp") or 1) > 1:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(dp=mesh_cfg.get("dp"),
                         tp=mesh_cfg.get("tp") or 1)
        logger.info("mesh: %s", mesh)

    datasets = build_datasets(cfg, cfg.get("train_datasets"))
    if not datasets:
        logger.warning("no train_datasets specified; nothing to do")
        return
    trainer = RetrieverTrainer(retriever, train_cfg, datasets, mesh=mesh)
    trainer.run_train(resume=bool(cfg.get("resume")))


if __name__ == "__main__":
    main()
