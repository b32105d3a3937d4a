"""Collectives tests: the GatherLayer equivalence (differentiable
all_gather inside shard_map) and host-object gather."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vsearch_tpu.parallel.collectives import (all_gather_objects,
                                              differentiable_all_gather,
                                              get_rank, get_world_size,
                                              is_master)
from vsearch_tpu.parallel.mesh import make_mesh


def test_rank_helpers_single_process():
    assert get_rank() == 0
    assert get_world_size() == 1
    assert is_master()
    assert all_gather_objects({"a": 1}) == [{"a": 1}]


def test_differentiable_all_gather_grad(rng):
    """Gradient of a global loss w.r.t. the LOCAL shard must equal the
    own-shard slice — the reference GatherLayer's backward contract
    (ddp_utils.py:98-117), which jax.lax.all_gather satisfies by
    construction."""
    mesh = make_mesh(dp=8, tp=1)
    x = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))

    def per_shard(xs, ws):
        gathered = differentiable_all_gather(xs, "dp")  # [8, 1, 4]
        flat = gathered.reshape(-1, 4)
        return (flat * ws).sum()  # global loss uses ALL shards

    loss_fn = jax.shard_map(
        lambda xs, ws: per_shard(xs, ws), mesh=mesh,
        in_specs=(P("dp"), P()), out_specs=P(), check_vma=False)

    def total(x):
        return loss_fn(x, w)[()] if False else loss_fn(x, w)

    g = jax.grad(lambda x: total(x).sum())(x)
    # d(loss)/dx[i] = w[i] (each shard's grad is its own slice of w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5)
