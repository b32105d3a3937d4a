"""Device mesh helpers: the TPU-native replacement for NCCL process groups.

The reference parallelizes with torch DDP over NCCL (reference:
src/ir/training/conf_utils.py:19-49). Here a ``jax.sharding.Mesh`` with a
``dp`` (data/batch) axis and a ``tp`` (vocab/tensor) axis carries all
parallelism; collectives are inserted by XLA from sharding annotations and
ride ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a (dp, tp) mesh over the available devices."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp > n:
        # fail with the mesh arithmetic, not numpy's opaque reshape error
        raise ValueError(
            f"mesh dp={dp} x tp={tp} needs {dp * tp} devices but only "
            f"{n} are available")
    if dp * tp != n:
        import logging
        logging.getLogger(__name__).warning(
            "mesh dp=%d x tp=%d uses %d of %d devices; the rest stay "
            "idle", dp, tp, dp * tp, n)
        devices = devices[: dp * tp]
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with batch-dim sharding.

    Single process: a plain sharded ``device_put``. Multi-process (mesh
    spans hosts): each process passes only its LOCAL rows and the global
    array is assembled via ``jax.make_array_from_process_local_data`` —
    the counterpart of the reference's per-rank DDP batches
    (src/ir/data/ddp_iterators.py:78-85), with no cross-host data
    movement: every process's rows land on its own devices."""
    sh = batch_sharding(mesh)
    dp = mesh.shape.get("dp", 1)
    pc = jax.process_count()

    def place(x):
        if pc > 1:
            local_dp = max(dp // pc, 1)
            if x.shape[0] % local_dp != 0:
                raise ValueError(
                    f"local batch dim {x.shape[0]} is not divisible by "
                    f"this process's dp share ({local_dp} of {dp})")
            global_shape = (x.shape[0] * pc,) + tuple(x.shape[1:])
            return jax.make_array_from_process_local_data(
                sh, np.asarray(x), global_shape)
        if dp > 1 and x.shape[0] % dp != 0:
            raise ValueError(
                f"batch dim {x.shape[0]} is not divisible by the mesh's "
                f"dp={dp}; pick a batch size that is a multiple of dp "
                f"(SPMD shards the batch across the dp axis)")
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(place, batch)
