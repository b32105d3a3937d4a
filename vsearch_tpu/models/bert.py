"""BERT encoder in flax — the neural backbone of every text encoder.

TPU-first re-implementation of the backbone the reference pulls in via HF
``AutoModel.from_pretrained`` (reference: src/ir/encoder/vdr.py:54,
src/ir/encoder/dpr.py:30). Written as a plain flax.linen module so the
whole forward jits into one XLA program: fused attention via
``jax.nn.dot_product_attention``, bf16-friendly matmuls on the MXU, static
shapes everywhere. HF torch checkpoints load via
``vsearch_tpu.models.hf_convert``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32  # compute dtype (bf16 on TPU hot paths)
    # GELU flavor: None resolves by dtype. Exact (erf) GELU is VPU-bound
    # and costs ~20% of the whole bert-base forward on this target
    # (measured 58.1 -> 46.3 ms at [256, 128] bf16,
    # scripts/probe_embed_mfu.py); the tanh approximation's ~1e-3 error
    # is below bf16's own quantization, so bf16 defaults to approximate
    # while f32 keeps erf for exact torch-checkpoint parity.
    approx_gelu: Optional[bool] = None

    @property
    def gelu_approximate(self) -> bool:
        if self.approx_gelu is not None:
            return self.approx_gelu
        return self.dtype == jnp.bfloat16

    @classmethod
    def tiny(cls, vocab_size: int = 512) -> "BertConfig":
        """Small config for tests."""
        return cls(vocab_size=vocab_size, hidden_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   intermediate_size=128, max_position_embeddings=64)


class BertEmbeddings(nn.Module):
    config: BertConfig
    word_embed: Optional[nn.Module] = None  # injected for weight tying

    @nn.compact
    def __call__(self, input_ids, token_type_ids, *, deterministic=True):
        cfg = self.config
        seq_len = input_ids.shape[1]
        embed = self.word_embed or nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
            name="word_embeddings")
        word = embed(input_ids)
        pos_ids = jnp.arange(seq_len)[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=cfg.dtype, name="position_embeddings")(pos_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                       dtype=cfg.dtype, name="token_type_embeddings")(
                           token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="layer_norm")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(
            x, deterministic=deterministic)
        return x


class BertSelfAttention(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_mask, *, deterministic=True):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_attention_heads
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                                      name=name)
        q = dense("query")(hidden)
        k = dense("key")(hidden)
        v = dense("value")(hidden)
        b, l, _ = hidden.shape
        shape = (b, l, cfg.num_attention_heads, head_dim)
        q, k, v = (t.reshape(shape) for t in (q, k, v))
        # mask: [B, L] -> broadcastable bool [B, 1, 1, L]
        mask = attention_mask[:, None, None, :].astype(jnp.bool_)
        if deterministic or cfg.attention_probs_dropout_prob == 0.0:
            ctx = jax.nn.dot_product_attention(q, k, v, mask=mask)
        else:
            # training path with attention-probability dropout (the
            # fused kernel has no dropout hook; BERT regularizes the
            # probs — reference torch BertSelfAttention semantics)
            scores = jnp.einsum("blhd,bmhd->bhlm", q, k).astype(
                jnp.float32) / jnp.sqrt(float(head_dim))
            scores = jnp.where(mask, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            probs = nn.Dropout(cfg.attention_probs_dropout_prob)(
                probs, deterministic=False)
            ctx = jnp.einsum("bhlm,bmhd->blhd",
                             probs.astype(v.dtype), v)
        ctx = ctx.reshape(b, l, cfg.hidden_size)
        out = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output")(ctx)
        out = nn.Dropout(cfg.hidden_dropout_prob)(
            out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            name="output_layer_norm")(out + hidden)


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_mask, *, deterministic=True):
        cfg = self.config
        attn = BertSelfAttention(cfg, name="attention")(
            hidden, attention_mask, deterministic=deterministic)
        inter = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                         name="intermediate")(attn)
        inter = nn.gelu(inter, approximate=cfg.gelu_approximate)
        out = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output")(inter)
        out = nn.Dropout(cfg.hidden_dropout_prob)(
            out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            name="output_layer_norm")(out + attn)


class BertModel(nn.Module):
    """Returns the last hidden state [B, L, H] (no pooler, matching the
    reference's ``add_pooling_layer=False`` usage).

    ``word_embed`` optionally injects an externally-created ``nn.Embed`` so
    a parent module can tie the input embedding with an output projection
    (the VDR vocabulary head projects onto the same matrix — reference:
    src/ir/encoder/vdr.py:72).
    """

    config: BertConfig
    word_embed: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 *, deterministic=True):
        cfg = self.config
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        x = BertEmbeddings(cfg, word_embed=self.word_embed,
                           name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic)
        for i in range(cfg.num_hidden_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(
                x, attention_mask, deterministic=deterministic)
        return x
