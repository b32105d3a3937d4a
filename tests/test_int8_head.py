"""Fused int8 head kernel: exactness on integer data, tolerance on
random data, mask handling, padding edges."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsearch_tpu.ops.int8_head import int8_head_pool, quantize_rows


def _reference_pool(h, proj, valid):
    """f32 masked max-pool of h @ proj.T (the XLA head semantics)."""
    lg = np.einsum("blh,vh->blv", np.asarray(h, np.float32),
                   np.asarray(proj, np.float32))
    lg = np.where(np.asarray(valid)[:, :, None], lg, -np.inf)
    return lg.max(axis=1)


def test_quantize_rows_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    x8, scale = quantize_rows(x)
    back = np.asarray(x8, np.float32) * np.asarray(scale)[:, None]
    np.testing.assert_allclose(back, np.asarray(x), atol=float(
        np.abs(np.asarray(x)).max() / 127 * 0.51))
    assert x8.dtype == jnp.int8
    assert int(np.abs(np.asarray(x8)).max()) <= 127


def test_exact_on_integer_data(rng):
    """Integer-valued inputs with amax 127 quantize losslessly, so the
    kernel must match the f32 reference bit-for-bit."""
    b, l, hd, v = 4, 32, 128, 300
    h = rng.integers(-127, 128, size=(b, l, hd)).astype(np.float32)
    # make per-row amax exactly 127 so scale = 1/... is exact
    h[:, :, 0] = 127.0
    proj = rng.integers(-127, 128, size=(v, hd)).astype(np.float32)
    proj[:, 0] = 127.0
    valid = np.ones((b, l), bool)
    out = int8_head_pool(jnp.asarray(h), jnp.asarray(proj),
                         jnp.asarray(valid), vt=128)
    ref = _reference_pool(h, proj, valid)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)


def test_close_on_random_data_and_mask(rng):
    b, l, hd, v = 2, 64, 96, 500
    h = rng.normal(size=(b, l, hd)).astype(np.float32)
    proj = rng.normal(size=(v, hd)).astype(np.float32)
    valid = rng.random((b, l)) > 0.3
    valid[:, 0] = True  # no fully-masked rows here
    out = np.asarray(int8_head_pool(jnp.asarray(h), jnp.asarray(proj),
                                    jnp.asarray(valid), vt=128))
    ref = _reference_pool(h, proj, valid)
    # int8 symmetric quantization: ~1% relative error at these dims
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=0.03 * scale)
    # masked positions must not contribute: sanity vs unmasked pool
    ref_nomask = _reference_pool(h, proj, np.ones_like(valid))
    assert not np.allclose(ref, ref_nomask)


def test_fully_masked_row_is_neg_inf(rng):
    b, l, hd, v = 2, 32, 64, 130
    h = rng.normal(size=(b, l, hd)).astype(np.float32)
    proj = rng.normal(size=(v, hd)).astype(np.float32)
    valid = np.ones((b, l), bool)
    valid[1, :] = False
    out = np.asarray(int8_head_pool(jnp.asarray(h), jnp.asarray(proj),
                                    jnp.asarray(valid), vt=128))
    assert np.isinf(out[1]).all() and (out[1] < 0).all()
    assert np.isfinite(out[0]).all()


def test_vocab_padding_sliced(rng):
    """V not a multiple of the tile: output must come back [B, V]."""
    b, l, hd, v = 2, 32, 64, 129
    h = rng.normal(size=(b, l, hd)).astype(np.float32)
    proj = rng.normal(size=(v, hd)).astype(np.float32)
    out = int8_head_pool(jnp.asarray(h), jnp.asarray(proj),
                         jnp.ones((b, l), jnp.int32), vt=128)
    assert out.shape == (b, v)


def test_vdr_module_int8_flag_close_to_exact(rng):
    """VDRModule(int8_head=True) embeddings stay within quantization
    tolerance of the exact bf16/f32 head, same top-support."""
    from vsearch_tpu.models.bert import BertConfig
    from vsearch_tpu.models.vdr import VDREncoderConfig, VDRModule

    bert = BertConfig(vocab_size=256, hidden_size=32,
                      num_hidden_layers=2, num_attention_heads=2,
                      intermediate_size=64, max_position_embeddings=64)
    mk = lambda int8: VDRModule(VDREncoderConfig(
        bert=bert, max_len=16, shift_vocab_num=5, topk=8,
        int8_head=int8))
    ids = jnp.asarray(rng.integers(5, 256, size=(2, 16)), jnp.int32)
    ttype = jnp.zeros_like(ids)
    mask = jnp.ones_like(ids).at[1, 10:].set(0)
    exact = mk(False)
    variables = exact.init(jax.random.PRNGKey(0), ids, ttype, mask)
    ref = np.asarray(exact.apply(variables, ids, ttype, mask))
    got = np.asarray(mk(True).apply(variables, ids, ttype, mask))
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=0.03 * scale)


def test_bf16_inputs(rng):
    b, l, hd, v = 2, 32, 64, 256
    h = rng.normal(size=(b, l, hd)).astype(np.float32)
    proj = rng.normal(size=(v, hd)).astype(np.float32)
    out16 = np.asarray(int8_head_pool(
        jnp.asarray(h, jnp.bfloat16), jnp.asarray(proj, jnp.bfloat16),
        jnp.ones((b, l), jnp.int32), vt=128))
    ref = _reference_pool(h, proj, np.ones((b, l), bool))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out16, ref, atol=0.05 * scale)


def test_set_int8_head_rejects_mean_pooling():
    """The fused kernel only backs the 'max' pooling arm; enabling it
    on a mean-pooling encoder must refuse loudly, not silently no-op
    (review finding, round 3)."""
    from tests.helpers import make_tokenizer, tiny_bert_config
    from vsearch_tpu.models.bert import BertConfig
    from vsearch_tpu.models.vdr import VDREncoder, VDREncoderConfig

    tok = make_tokenizer()
    bert = tiny_bert_config(tok.vocab_size)
    cfg = VDREncoderConfig(
        bert=BertConfig(**{k: v for k, v in vars(bert).items()
                           if k in BertConfig.__dataclass_fields__}),
        max_len=16, shift_vocab_num=5, pooling="mean", pooling_topk=4)
    enc = VDREncoder(cfg, tokenizer=tok)
    with pytest.raises(ValueError, match="pooling='max' only"):
        enc.set_int8_head(True)
    # disabling is always fine
    enc.set_int8_head(False)
