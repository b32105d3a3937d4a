"""Tensor-parallel axis validation.

The (dp, tp) mesh must be a pure performance knob: the same train step on
dp=8/tp=1, dp=4/tp=2, dp=2/tp=4 and a meshless single program must produce
the same loss and the same updated parameters (SPMD is semantics-
preserving). Also exercises sharded search on a 2-axis mesh, including
row-sharding over the tp axis. Counterpart of the parallelism table in
SURVEY.md §2b (our TP has no reference equivalent — torch DDP only).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import tiny_bert_config
from vsearch_tpu.models.vdr import VDREncoderConfig, VDRModule
from vsearch_tpu.parallel.mesh import make_mesh, shard_batch
from vsearch_tpu.train.loss import VDRLossConfig
from vsearch_tpu.train.optim import get_optimizer, get_schedule_linear
from vsearch_tpu.train.step import (TrainBatch, TrainState,
                                    TrainStepConfig, make_encoder_apply,
                                    make_train_step)

VOCAB, SHIFT = 96, 5


def _setup():
    cfg = VDREncoderConfig(bert=tiny_bert_config(VOCAB), max_len=16,
                           shift_vocab_num=SHIFT, topk=8)
    module = VDRModule(cfg)
    dummy = jnp.zeros((1, 8), jnp.int32)
    params = module.init(jax.random.PRNGKey(0), dummy, dummy,
                         jnp.ones((1, 8), jnp.int32))["params"]
    step_cfg = TrainStepConfig(encoder_type="vdr", vocab_size=VOCAB,
                               shift_vocab_num=SHIFT,
                               loss=VDRLossConfig(topk=8))
    # deterministic forward: dropout rng must not differ across meshes
    apply = make_encoder_apply(module, deterministic=True)
    rng = np.random.default_rng(0)
    batch = TrainBatch(
        q_ids=jnp.asarray(rng.integers(SHIFT, VOCAB, size=(16, 12)),
                          jnp.int32),
        p_ids=jnp.asarray(rng.integers(SHIFT, VOCAB, size=(32, 12)),
                          jnp.int32))
    return params, step_cfg, apply, batch


def _run_one_step(params, step_cfg, apply, batch, mesh):
    tx = get_optimizer(params, learning_rate=1e-3,
                       schedule=get_schedule_linear(2, 50, 1e-3),
                       weight_decay=0.01)
    state = TrainState.create(params, tx)
    step = make_train_step(apply, apply, step_cfg, mesh=mesh,
                           shared_params=True)
    if mesh is not None:
        with mesh:
            batch = shard_batch(mesh, batch)
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
    else:
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state.params))
    return float(metrics["loss"]), float(metrics["grad_norm"]), flat


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_train_step_invariant_across_dp_tp_layouts():
    params, step_cfg, apply, batch = _setup()
    base_loss, base_gnorm, base_params = _run_one_step(
        params, step_cfg, apply, batch, mesh=None)
    for dp, tp in ((8, 1), (4, 2), (2, 4)):
        mesh = make_mesh(dp=dp, tp=tp)
        loss, gnorm, new_params = _run_one_step(
            params, step_cfg, apply, batch, mesh)
        assert np.isfinite(loss)
        np.testing.assert_allclose(loss, base_loss, rtol=1e-5,
                                   err_msg=f"loss dp={dp} tp={tp}")
        np.testing.assert_allclose(gnorm, base_gnorm, rtol=1e-4,
                                   err_msg=f"grad_norm dp={dp} tp={tp}")
        for a, b in zip(new_params, base_params):
            np.testing.assert_allclose(
                a, b, rtol=5e-5, atol=1e-6,
                err_msg=f"params dp={dp} tp={tp}")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_dense_search_on_two_axis_mesh():
    from vsearch_tpu.parallel.sharded_search import (
        make_sharded_dense_search, shard_rows)

    rng = np.random.default_rng(1)
    vectors = rng.normal(size=(64, 32)).astype(np.float32)
    queries = rng.normal(size=(4, 32)).astype(np.float32)
    k = 5
    exact_scores = queries @ vectors.T
    exact_ids = np.argsort(-exact_scores, axis=1)[:, :k]

    mesh = make_mesh(dp=4, tp=2)
    for axis in ("dp", "tp"):
        with mesh:
            vec_sh = shard_rows(mesh, jnp.asarray(vectors),
                                axis_name=axis)
            search = make_sharded_dense_search(
                mesh, k=k, num_rows=vectors.shape[0], axis_name=axis)
            ids, scores = search(jnp.asarray(queries), vec_sh)
        np.testing.assert_array_equal(np.asarray(ids), exact_ids,
                                      err_msg=f"axis={axis}")
        np.testing.assert_allclose(
            np.asarray(scores),
            np.take_along_axis(exact_scores, exact_ids, axis=1),
            rtol=1e-5, err_msg=f"axis={axis}")
