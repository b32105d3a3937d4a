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
import re
from typing import Any, Dict, Optional, Tuple

import jax

logger = logging.getLogger(__name__)

_META_NAME = "train_meta.json"


def save_checkpoint(directory: str, state, epoch: int = 0,
                    offset: int = 0, extra: Optional[Dict] = None):
    """Write TrainState + iteration metadata under ``directory``."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    target = os.path.join(directory, "state")
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": state.step}
    ckptr.save(target, payload, force=True)
    ckptr.wait_until_finished()
    meta = {"epoch": epoch, "offset": offset,
            "step": int(jax.device_get(state.step))}
    if extra:
        meta.update(extra)
    with open(os.path.join(directory, _META_NAME), "w") as f:
        json.dump(meta, f)
    logger.info("checkpoint saved to %s (epoch=%d offset=%d)", directory,
                epoch, offset)


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


def latest_checkpoint(output_dir: str, prefix: str = "checkpoint"
                      ) -> Optional[str]:
    """Find the newest checkpoint dir ``<prefix>_<n>`` (counterpart of
    reference model_utils.py:138-149)."""
    if not os.path.isdir(output_dir):
        return None
    best, best_n = None, -1
    pat = re.compile(re.escape(prefix) + r"_(\d+)$")
    for name in os.listdir(output_dir):
        m = pat.match(name)
        if m and int(m.group(1)) > best_n:
            full = os.path.join(output_dir, name)
            if os.path.isdir(full):
                best, best_n = full, int(m.group(1))
    return best
