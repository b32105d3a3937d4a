"""Train-step tests on a virtual 8-device CPU mesh: sharded step runs,
loss decreases, shared-encoder mode, dpr mode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_tokenizer, tiny_bert_config
from vsearch_tpu.models.vdr import VDREncoderConfig, VDRModule
from vsearch_tpu.models.dpr import DPREncoderConfig, DPRModule
from vsearch_tpu.parallel.mesh import make_mesh, shard_batch
from vsearch_tpu.train.loss import VDRLossConfig
from vsearch_tpu.train.optim import get_optimizer, get_schedule_linear
from vsearch_tpu.train.step import (TrainBatch, TrainState, TrainStepConfig,
                                    make_encoder_apply, make_train_step)


def make_batch(rng, n=8, negs=1, lq=12, lp=16, vocab=200):
    q_ids = rng.integers(5, vocab, size=(n, lq)).astype(np.int32)
    p_ids = rng.integers(5, vocab, size=(n * (1 + negs), lp)).astype(
        np.int32)
    # positives share tokens with their query
    p_ids[:n, :lq] = q_ids
    return TrainBatch(q_ids=jnp.asarray(q_ids), p_ids=jnp.asarray(p_ids))


@pytest.fixture(scope="module")
def vdr_setup():
    tok = make_tokenizer()
    cfg = VDREncoderConfig(bert=tiny_bert_config(tok.vocab_size),
                           shift_vocab_num=5, max_len=32, topk=16)
    module = VDRModule(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 8), jnp.int32),
                         jnp.zeros((1, 8), jnp.int32),
                         jnp.ones((1, 8), jnp.int32))["params"]
    step_cfg = TrainStepConfig(
        encoder_type="vdr", vocab_size=cfg.vocab_size,
        shift_vocab_num=cfg.shift_vocab_num,
        loss=VDRLossConfig(topk=16))
    return module, params, step_cfg, cfg


def test_train_step_single_device(vdr_setup, rng):
    module, params, step_cfg, cfg = vdr_setup
    apply = make_encoder_apply(module, deterministic=False)
    tx = get_optimizer(params, learning_rate=1e-3)
    state = TrainState.create(params, tx)
    step = make_train_step(apply, apply, step_cfg, mesh=None,
                           shared_params=True)
    batch = make_batch(rng, vocab=module.config.vocab_size)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert all(np.isfinite(losses))
    # same batch repeatedly -> loss must drop
    assert min(losses[4:]) < losses[0]


def test_train_step_mesh_sharded(vdr_setup, rng):
    assert len(jax.devices()) == 8, "conftest must provide 8 cpu devices"
    module, params, step_cfg, _ = vdr_setup
    mesh = make_mesh(dp=4, tp=2)
    apply = make_encoder_apply(module, deterministic=False)
    tx = get_optimizer(params, learning_rate=1e-3)
    state = TrainState.create(params, tx)
    step = make_train_step(apply, apply, step_cfg, mesh=mesh,
                           shared_params=True)
    batch = make_batch(rng, n=8, vocab=module.config.vocab_size)
    with mesh:
        batch = shard_batch(mesh, batch)
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        state, metrics2 = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics2["loss"]))
    assert float(metrics2["loss"]) < float(metrics["loss"]) + 1.0


def test_mesh_matches_single_device(vdr_setup, rng):
    """The sharded step must compute the same loss as the unsharded one
    (dropout off for determinism)."""
    module, params, step_cfg, _ = vdr_setup
    apply = make_encoder_apply(module, deterministic=True)
    tx = get_optimizer(params, learning_rate=1e-3)
    batch = make_batch(rng, n=8, vocab=module.config.vocab_size)

    state1 = TrainState.create(params, tx)
    step1 = make_train_step(apply, apply, step_cfg, mesh=None,
                            shared_params=True)
    _, m1 = step1(state1, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(dp=8, tp=1)
    state2 = TrainState.create(params, tx)
    step2 = make_train_step(apply, apply, step_cfg, mesh=mesh,
                            shared_params=True)
    with mesh:
        sbatch = shard_batch(mesh, batch)
        _, m2 = step2(state2, sbatch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)


def test_train_step_dpr_separate_encoders(rng):
    tok = make_tokenizer()
    cfg = DPREncoderConfig(bert=tiny_bert_config(tok.vocab_size),
                           max_len=32)
    module = DPRModule(cfg)
    init = lambda seed: module.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))["params"]
    params = {"q": init(0), "p": init(1)}
    apply = make_encoder_apply(module, deterministic=False)
    tx = get_optimizer(params, learning_rate=1e-3)
    state = TrainState.create(params, tx)
    step_cfg = TrainStepConfig(encoder_type="dpr")
    step = make_train_step(apply, apply, step_cfg, shared_params=False)
    batch = make_batch(rng, vocab=cfg.bert.vocab_size)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # both towers must receive gradients
    leaves_before = jax.tree_util.tree_leaves(params)
    leaves_after = jax.tree_util.tree_leaves(state.params)
    changed = sum(not np.allclose(a, b)
                  for a, b in zip(leaves_before, leaves_after))
    assert changed > len(leaves_before) // 2
