"""Collective/communication utilities.

Counterpart of reference src/ir/training/ddp_utils.py. Most of that file
dissolves on TPU:

* ``GatherLayer`` (autograd-aware NCCL all_gather, ddp_utils.py:98-117):
  ``jax.lax.all_gather`` is differentiable by construction — its VJP is
  the own-shard slice — so global in-batch negatives need no custom
  autograd. ``differentiable_all_gather`` is a thin alias for use inside
  ``shard_map`` code.
* DDP gradient all-reduce: implicit in the pjit-compiled update.
* ``all_gather_list`` (pickled python objects over a byte buffer,
  ddp_utils.py:43-96): ``all_gather_objects`` uses jax's multihost
  process_allgather for arrays and a pickle wrapper for objects.
"""
from __future__ import annotations

import pickle
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def get_rank() -> int:
    """Process index (reference ddp_utils.py:9-15)."""
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_master() -> bool:
    return jax.process_index() == 0


def differentiable_all_gather(x: jax.Array, axis_name: str) -> jax.Array:
    """all_gather with gradients flowing back to the local shard — the
    GatherLayer equivalent, for use inside shard_map/pmap bodies."""
    return jax.lax.all_gather(x, axis_name)


def all_gather_objects(obj: Any, max_bytes: int = 1 << 20) -> List[Any]:
    """Gather arbitrary picklable objects from every process.

    Single-process: returns [obj]. Multi-host: pickles into a fixed-size
    uint8 buffer and runs a cross-process allgather (the TPU-native
    version of the reference's byte-buffer trick, ddp_utils.py:43-96).
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj)
    # the size check must be COLLECTIVE: if one process raised locally
    # while the others entered the allgather, they would block forever
    # at the cross-process barrier instead of failing cleanly
    sizes = multihost_utils.process_allgather(
        jnp.asarray([len(payload) + 8], dtype=jnp.int64))
    max_size = int(np.max(np.asarray(sizes)))
    if max_size > max_bytes:
        raise ValueError(
            f"an object of {max_size - 8} bytes (largest across "
            f"processes) exceeds max_bytes {max_bytes}; pass a larger "
            "max_bytes")
    buf = np.zeros(max_bytes, dtype=np.uint8)
    buf[:8] = np.frombuffer(
        len(payload).to_bytes(8, "little"), dtype=np.uint8)
    buf[8: 8 + len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    gathered = multihost_utils.process_allgather(jnp.asarray(buf))
    out = []
    arr = np.asarray(gathered)
    for row in arr:
        size = int.from_bytes(row[:8].tobytes(), "little")
        out.append(pickle.loads(row[8: 8 + size].tobytes()))
    return out


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids=None) -> bool:
    """Multi-host bring-up (replaces init_process_group(backend='nccl'),
    reference conf_utils.py:19-49).

    Must be called BEFORE any jax API that initializes the local backend
    (jax.devices(), jax.process_count(), any computation) — this function
    deliberately makes no such call before deciding. Args fall back to
    torchrun-style env vars, mirroring the reference's LOCAL_RANK /
    WORLD_SIZE consumption (conf_utils.py:23-27):
      COORDINATOR_ADDRESS (or MASTER_ADDR:MASTER_PORT), WORLD_SIZE, RANK.

    Returns True when running distributed (initialized now or earlier),
    False for single-host.
    """
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address is None and os.environ.get("MASTER_ADDR"):
        port = os.environ.get("MASTER_PORT", "1234")
        coordinator_address = f"{os.environ['MASTER_ADDR']}:{port}"
    if num_processes is None and os.environ.get("WORLD_SIZE"):
        num_processes = int(os.environ["WORLD_SIZE"])
    if process_id is None and os.environ.get("RANK"):
        process_id = int(os.environ["RANK"])
    if coordinator_address is None:
        return False  # single host
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            local_device_ids=local_device_ids)
    except RuntimeError as exc:
        if "already" not in str(exc).lower():
            raise
    return True
