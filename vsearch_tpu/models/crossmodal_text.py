"""Cross-modal VDR text encoder: text -> valid-vocab-subspace vector.

TPU-native rebuild of reference src/ir/encoder/vdr_crossmodal_text.py:
28-152: BERT -> LayerNorm -> projection onto the word embeddings of the
*valid* vocab subset -> max-pool -> elu1p -> mandatory L2 norm.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import elu1p
from ..ops.sparse import build_topk_mask
from .bert import BertConfig, BertModel
from .encoder_base import TextEncoderBase
from .valid_vocab import VALID_TOKEN_IDS, valid_token_ids


@dataclasses.dataclass(frozen=True)
class VDRTextEncoderConfig:
    model_id: str = "bert-base-uncased"
    max_len: int = 256
    topk: int = 768
    # Reference semantics: encode() pads to max_len unconditionally
    # (padding="max_length", vdr_crossmodal_text.py:66) and the max-pool
    # consumes those PAD positions (:53-56), so its embeddings depend on
    # max_len. Off by default (padding-invariant masked pooling); set
    # True automatically when converting reference torch checkpoints so
    # their golden scores reproduce.
    compat_pad_pooling: bool = False
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    type: str = "vdr_crossmodal_text"

    @property
    def vocab_size(self) -> int:
        return self.bert.vocab_size

    @property
    def out_dim(self) -> int:
        return len(self.valid_ids)

    @property
    def valid_ids(self) -> np.ndarray:
        if self.bert.vocab_size == 30522:
            return VALID_TOKEN_IDS
        # tests / small vocabs: treat everything past specials as valid
        return valid_token_ids(self.bert.vocab_size) if \
            self.bert.vocab_size > 30000 else np.arange(
                5, self.bert.vocab_size)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "VDRTextEncoderConfig":
        bert_keys = {f.name for f in dataclasses.fields(BertConfig)}
        own_keys = {f.name for f in dataclasses.fields(cls)} - {"bert"}
        bert = BertConfig(**{k: v for k, v in d.items() if k in bert_keys})
        own = {k: v for k, v in d.items() if k in own_keys}
        return cls(bert=bert, **own)


class VDRTextModule(nn.Module):
    """tokens -> [B, V_valid] normalized vocab-subspace embedding
    (reference vdr_crossmodal_text.py:39-57)."""

    config: VDRTextEncoderConfig

    def setup(self):
        bcfg = self.config.bert
        self.word_embeddings = nn.Embed(
            bcfg.vocab_size, bcfg.hidden_size, dtype=bcfg.dtype,
            name="word_embeddings")
        self.bert = BertModel(bcfg, word_embed=self.word_embeddings,
                              name="bert")
        self.ln = nn.LayerNorm(epsilon=1e-5, name="ln")

    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 *, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        h = self.bert(input_ids, token_type_ids, attention_mask,
                      deterministic=deterministic)
        h = self.ln(h)
        proj = self.word_embeddings.embedding[
            jnp.asarray(cfg.valid_ids)]  # [V_valid, H]
        precision = (jax.lax.Precision.HIGHEST
                     if cfg.bert.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
        logits = jax.lax.dot_general(
            h, proj, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)  # [B, L, V_valid]
        if cfg.compat_pad_pooling:
            # reference pools every position of the max_len-padded batch
            pooled = logits.max(axis=1)
        else:
            valid = attention_mask[:, :, None].astype(jnp.bool_)
            neg = jnp.asarray(-jnp.inf, dtype=logits.dtype)
            pooled = jnp.where(valid, logits, neg).max(axis=1)
        emb = elu1p(pooled)
        # L2 norm is mandatory for cross-modal (reference :56)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)


class VDRTextEncoder(TextEncoderBase):
    config_class = VDRTextEncoderConfig

    def encode(self, texts, max_len=None):
        enc = super().encode(texts, max_len=max_len)
        if self.config.compat_pad_pooling:
            # reproduce the reference's padding="max_length": the compat
            # max-pool consumes PAD positions, so the pad length is part
            # of the model function
            target = max_len or self.config.max_len
            pad = target - enc["input_ids"].shape[1]
            if pad > 0:
                # input_ids must extend with the REAL pad token: the
                # compat max-pool consumes pad-position embeddings, and
                # padding with id 0 diverges from the reference for any
                # tokenizer whose pad id is nonzero. token_type_ids and
                # attention_mask stay 0-padded.
                pad_id = int(getattr(self.tokenizer, "pad_id", 0) or 0)
                enc = {k: np.pad(v, ((0, 0), (0, pad)),
                                 constant_values=(pad_id if
                                                  k == "input_ids"
                                                  else 0))
                       for k, v in enc.items()}
        return enc

    def __init__(self, config: VDRTextEncoderConfig, variables=None,
                 tokenizer=None, rng: Optional[jax.Array] = None):
        self.module = VDRTextModule(config)
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, 8), dtype=jnp.int32)
            # jit the init: eager flax init dispatches one device op
            # per parameter (minutes over a remote device link);
            # compiled it is a single program
            variables = jax.jit(self.module.init)(rng, dummy,
                                                  dummy, dummy)
        if tokenizer is None:
            from ..tokenization import get_tokenizer
            tokenizer = get_tokenizer(config.model_id)
        super().__init__(config, variables, tokenizer)
        self._valid_ids = np.asarray(config.valid_ids)
        self._lid2vid = {int(l): v for v, l in enumerate(self._valid_ids)}

    def _bow_valid(self, ids: jax.Array) -> jax.Array:
        """BoW over the full vocab, selected down to valid columns
        (reference vdr_crossmodal_text.py:69-72)."""
        from ..ops.sparse import build_bow_mask

        bow = build_bow_mask(ids, vocab_size=self.config.vocab_size)
        return bow[:, jnp.asarray(self._valid_ids)]

    def _make_embed_fn(self, topk: Optional[int]):
        def fn(variables, ids, ttype, mask):
            emb = self.module.apply(variables, ids, ttype, mask)
            bow = self._bow_valid(ids)
            if topk == 0:
                m = bow > 0
            elif topk is None or topk == -1:
                m = jnp.ones_like(bow, dtype=jnp.bool_)
            else:
                m = jnp.logical_or(build_topk_mask(emb, k=topk), bow > 0)
            return emb * m

        return jax.jit(fn)

    def embed(self, texts: Union[str, List[str]], batch_size: int = 128,
              max_len: Optional[int] = None, topk: Optional[int] = "cfg",
              bow: bool = False, **_ignored) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        max_len = max_len or self.config.max_len
        if topk == "cfg":
            topk = self.config.topk
        if topk is not None and topk > 0:
            # clamp to the valid-vocab output dim (lax.top_k rejects
            # k > dim; clamping before the cache key dedups compiles)
            topk = min(topk, self.config.out_dim)
        if bow:
            key, make = "bow", lambda L: jax.jit(
                lambda v, ids, tt, am: self._bow_valid(ids))
        else:
            key = ("emb", topk)
            make = lambda L: self._make_embed_fn(topk)
        return self._run_batches(texts, batch_size, max_len, key, make)

    def disentangle(self, text: str, topk: Optional[int] = None,
                    visual: bool = False, save_file: Optional[str] = None
                    ) -> Dict[str, float]:
        topk = topk or self.config.topk
        emb = self.embed(text)[0]
        k = min(topk, emb.shape[-1])
        idx = [int(i) for i in np.argsort(-emb)[:k] if emb[i] != 0]
        token_ids = [int(self._valid_ids[i]) for i in idx]
        tokens = self.tokenizer.convert_ids_to_tokens(token_ids)
        results = dict(zip(tokens, [float(emb[i]) for i in idx]))
        if visual:
            from ..utils.vis import wordcloud_from_dict
            wordcloud_from_dict(results, max_words=topk,
                                save_file=save_file)
        return results

    dst = disentangle
