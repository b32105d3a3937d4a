"""Checkpoint/resume: full training state, not just model weights.

The reference checkpoints only model weights via HF ``save_pretrained``
(reference: train_ir.py:205-215) and never persists optimizer state (its
``CheckpointState`` machinery, model_utils.py:37-47, is dead code). Here
the whole ``TrainState`` (params + optimizer + step) plus data-iterator
position checkpoints through orbax, giving true mid-epoch resume.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax

logger = logging.getLogger(__name__)

_META_NAME = "train_meta.json"


def save_checkpoint(directory: str, state, epoch: int = 0,
                    offset: int = 0, extra: Optional[Dict] = None):
    """Write TrainState + iteration metadata under ``directory``,
    ATOMICALLY: repeated saves (save_steps) target one fixed dir, and a
    crash mid-save — the very event checkpoints guard against — must
    never destroy the previous good checkpoint or leave state/meta
    desynced. The full payload (orbax state + meta) lands in a ``.tmp``
    sibling first and is committed by directory renames; meta is
    written before the commit, so any directory that contains both
    ``state`` and the meta file is complete and consistent."""
    import shutil

    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    tmp = directory + ".tmp"
    primary = jax.process_index() == 0

    def _complete(d):
        return (os.path.isdir(os.path.join(d, "state"))
                and os.path.isfile(os.path.join(d, _META_NAME)))

    if primary:
        if _complete(tmp) and not _complete(directory):
            # a previous save crashed between displacing the old dir
            # and committing tmp: tmp is the NEWEST good checkpoint and
            # resolve_checkpoint_dir has been serving it. Finish that
            # commit before starting a new save — rmtree'ing it here
            # would destroy the only up-to-date state and a second
            # crash would fall back two generations.
            old = directory + ".old"
            shutil.rmtree(old, ignore_errors=True)
            if os.path.isdir(directory):
                os.rename(directory, old)
            os.rename(tmp, directory)
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": state.step}
    ckptr.save(os.path.join(tmp, "state"), payload, force=True)
    ckptr.wait_until_finished()
    if primary:
        meta = {"epoch": epoch, "offset": offset,
                "step": int(jax.device_get(state.step))}
        if extra:
            meta.update(extra)
        with open(os.path.join(tmp, _META_NAME), "w") as f:
            json.dump(meta, f)
        # commit: previous checkpoint survives until the new one is in
        # place; resolve_checkpoint_dir knows the intermediate states
        old = directory + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(directory):
            os.rename(directory, old)
        os.rename(tmp, directory)
        shutil.rmtree(old, ignore_errors=True)
    logger.info("checkpoint saved to %s (epoch=%d offset=%d)", directory,
                epoch, offset)


def resolve_checkpoint_dir(directory: str) -> Optional[str]:
    """Newest COMPLETE checkpoint for ``directory``, tolerating a crash
    at any point of the atomic save: prefer the committed dir, then a
    complete-but-uncommitted ``.tmp``, then the displaced ``.old``."""
    directory = os.path.abspath(directory)
    for cand in (directory, directory + ".tmp", directory + ".old"):
        if (os.path.isdir(os.path.join(cand, "state"))
                and os.path.isfile(os.path.join(cand, _META_NAME))):
            return cand
    return None


def load_checkpoint(directory: str, state) -> Tuple[Any, Dict]:
    """Restore a TrainState saved by ``save_checkpoint``; ``state`` is the
    abstract template (freshly-created state with the same structure)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    template = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step}
    restored = ckptr.restore(os.path.join(directory, "state"), template)
    new_state = state.replace(params=restored["params"],
                              opt_state=restored["opt_state"],
                              step=restored["step"])
    meta_path = os.path.join(directory, _META_NAME)
    meta = {}
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return new_state, meta
