"""VDR encoder: text -> sparse vector on the LM vocabulary space.

TPU-native rebuild of the reference's core model (reference:
src/ir/encoder/vdr.py:47-192): BERT last hidden states -> LayerNorm ->
projection onto the (vocab-shifted) tied word-embedding matrix -> elu1p ->
max-pool over the sequence -> optional L2 norm, then top-k / bag-of-words
masking.

TPU-first differences from the reference (intended behavior, not bugs):
  * padding positions are masked out of the pooling by default, so
    embeddings are invariant to the static padding length (the reference
    max-pools pad positions too, making its output depend on dynamic
    batch padding); ``compat_pad_pooling=True`` reproduces the
    reference's behavior exactly and is the default when loading
    reference torch checkpoints (golden-score parity);
  * elu1p commutes with max (both monotone), so the kernel max-pools the
    raw logits and applies elu1p once on the pooled [B, V'] — saving a
    [B, L, V'] elementwise pass;
  * the whole embed pipeline (BERT -> project -> pool -> topk/bow mask)
    runs inside one jit per (batch, length-bucket) shape.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import elu1p
from ..ops.sparse import build_bow_mask, build_topk_mask
from .bert import BertConfig, BertModel
from .encoder_base import TextEncoderBase


@dataclasses.dataclass(frozen=True)
class VDREncoderConfig:
    """Counterpart of reference VDREncoderConfig
    (src/ir/encoder/vdr.py:21-44)."""

    model_id: str = "bert-base-uncased"
    max_len: int = 256
    norm: bool = False
    shift_vocab_num: int = 999
    topk: int = 768
    pooling: str = "max"  # 'max' | 'mean'
    pooling_topk: int = 0  # for 'mean': average of top-k sequence acts
    # Reproduce the reference's pooling over PAD positions exactly
    # (reference src/ir/encoder/vdr.py:74-82 pools the full [B, L, V']
    # tensor, so its embeddings depend on batch padding length). Off by
    # default — the TPU-native default is padding-invariant pooling —
    # but set True automatically when converting reference torch
    # checkpoints, so published golden scores reproduce bit-for-bit.
    compat_pad_pooling: bool = False
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    type: str = "vdr"

    @property
    def vocab_size(self) -> int:
        return self.bert.vocab_size

    @property
    def out_dim(self) -> int:
        return self.bert.vocab_size - self.shift_vocab_num

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "VDREncoderConfig":
        bert_keys = {f.name for f in dataclasses.fields(BertConfig)}
        own_keys = {f.name for f in dataclasses.fields(cls)} - {"bert"}
        bert = BertConfig(**{k: v for k, v in d.items() if k in bert_keys})
        own = {k: v for k, v in d.items() if k in own_keys}
        return cls(bert=bert, **own)


class VDRModule(nn.Module):
    """The jit-able forward: tokens -> [B, V - shift] vocab embedding."""

    config: VDREncoderConfig

    def setup(self):
        bcfg = self.config.bert
        self.word_embeddings = nn.Embed(
            bcfg.vocab_size, bcfg.hidden_size, dtype=bcfg.dtype,
            name="word_embeddings")
        self.bert = BertModel(bcfg, word_embed=self.word_embeddings,
                              name="bert")
        # torch.nn.LayerNorm default eps (reference src/ir/encoder/vdr.py:53)
        self.ln = nn.LayerNorm(epsilon=1e-5, name="ln")

    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 *, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        h = self.bert(input_ids, token_type_ids, attention_mask,
                      deterministic=deterministic)
        h = self.ln(h)
        proj = self.word_embeddings.embedding[cfg.shift_vocab_num:]  # [V', H]
        v_out = proj.shape[0]
        # pad the vocab axis to a lane multiple: XLA's schedules for
        # unaligned-N matmuls on this target range from 50x to 500x
        # slower (measured: [1024,768]@[768,29523] = 18.8 s vs 29568 =
        # 45 ms); padded rows are zero and sliced off after pooling
        v_pad = (-v_out) % 128
        if v_pad:
            proj = jnp.pad(proj, ((0, v_pad), (0, 0)))
        # f32 weights -> full precision (parity with the reference's
        # golden scores); bf16 weights already run native MXU passes
        precision = (jax.lax.Precision.HIGHEST
                     if cfg.bert.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

        def project(hx):
            return jax.lax.dot_general(
                hx, proj,
                dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)

        if cfg.compat_pad_pooling:
            # Reference semantics: tokenize(padding=True) pads to the
            # longest row in the batch and pooling consumes those pad
            # positions (reference vdr.py:74,90). Our static buckets can
            # be longer, so pool exactly the positions the reference
            # would have: pos < max row length (in-graph, stays jittable).
            longest = attention_mask.sum(axis=1).max()
            valid = (jnp.arange(attention_mask.shape[1])[None, :]
                     < longest)
            valid = jnp.broadcast_to(valid, attention_mask.shape)
        else:
            valid = attention_mask.astype(jnp.bool_)
        if cfg.pooling == "max":
            # elu1p commutes with max, so pool raw logits. Two chunked
            # strategies keep the [B, L, V'] logits tensor out of HBM:
            b, l, _ = h.shape
            if b * l >= 8192:
                # vocab-chunked: scan over V' chunks with the FULL
                # M = B*L GEMM each step. The K=768 matmuls on this
                # target only reach peak with both M and N large —
                # measured 154 TF/s vs 90-97 for the L-chunked scan at
                # [256, 128] (scripts/probe_embed_mfu.py) — a 1.6x
                # head speedup at serving batch sizes.
                hx = h.reshape(b * l, -1)
                n_chunks = max(1, -(-proj.shape[0] // 2048))
                nc_raw = -(-proj.shape[0] // n_chunks)
                nc = -(-nc_raw // 128) * 128  # lane-aligned chunk
                extra = n_chunks * nc - proj.shape[0]
                projc = (jnp.pad(proj, ((0, extra), (0, 0)))
                         if extra else proj)
                ws = projc.reshape(n_chunks, nc, -1)  # [C, nc, H]

                def vbody(_, wc):
                    lg = jax.lax.dot_general(
                        hx, wc, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision)
                    lg = lg.reshape(b, l, nc)
                    return None, jnp.where(valid[:, :, None], lg,
                                           -jnp.inf).max(axis=1)

                _, out = jax.lax.scan(vbody, None, ws)  # [C, B, nc]
                pooled = jnp.moveaxis(out, 0, 1).reshape(
                    b, n_chunks * nc)[:, : proj.shape[0]]
            else:
                # small batches: L-chunked running max, M >= 4096 rows
                want = max(1, -(-4096 // b))
                ch = next((c for c in (64, 32, 16, 8, 4, 2)
                           if l % c == 0 and c >= want), None)
                if ch is None:
                    ch = next((c for c in (64, 32, 16, 8, 4, 2)
                               if l % c == 0), 1)
                hc = jnp.moveaxis(h.reshape(b, l // ch, ch, -1), 1, 0)
                mc = jnp.moveaxis(valid.reshape(b, l // ch, ch), 1, 0)

                def body(carry, xs):
                    hx, mx = xs  # [B, ch, H], [B, ch]
                    lg = project(hx)
                    lg = jnp.where(mx[:, :, None], lg,
                                   -jnp.inf).max(axis=1)
                    return jnp.maximum(carry, lg), None

                pooled, _ = jax.lax.scan(
                    body, jnp.full((b, proj.shape[0]), -jnp.inf,
                                   jnp.float32), (hc, mc))
            emb = elu1p(pooled)
        elif cfg.pooling == "mean":
            logits = project(h)  # [B, L, V']
            validb = valid[:, :, None]
            acts = elu1p(logits) * validb.astype(logits.dtype)
            if cfg.pooling_topk:
                # top-k over the sequence axis per vocab dim
                acts_t = jnp.swapaxes(acts, 1, 2)  # [B, V', L]
                top, _ = jax.lax.top_k(acts_t, cfg.pooling_topk)
                emb = top.mean(axis=-1)
            else:
                denom = jnp.maximum(
                    validb.astype(logits.dtype).sum(axis=1), 1.0)
                emb = acts.sum(axis=1) / denom
        else:
            raise NotImplementedError(cfg.pooling)
        emb = emb[:, :v_out]  # drop alignment padding dims
        if cfg.norm:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb


class VDREncoder(TextEncoderBase):
    """Host-facing VDR encoder with the reference's ``embed`` surface
    (src/ir/encoder/vdr.py:97-179)."""

    config_class = VDREncoderConfig

    def __init__(self, config: VDREncoderConfig, variables=None,
                 tokenizer=None, rng: Optional[jax.Array] = None):
        self.module = VDRModule(config)
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

    # NOTE: a fused int8 projection head (quantized GEMM + dequant +
    # masked max-pool in one Pallas kernel) was implemented, measured
    # on-chip and REMOVED in round 4: 1.05-1.08x end-to-end embed
    # speedup at 1.1% max relative score error — under the 1.15x /
    # 0.5%-error keep bar (scripts/probe_int8_ab.py; full numbers in
    # docs/ARCHITECTURE.md). The bf16 vocab-chunked head below is the
    # exact-parity production path.

    # -- jitted pipelines --------------------------------------------------
    def _make_embed_fn(self, topk: Optional[int], activate_lexical: bool,
                      train_dropout: bool = False):
        cfg = self.config

        def fn(variables, ids, ttype, mask):
            emb = self.module.apply(variables, ids, ttype, mask)
            bow = build_bow_mask(ids, vocab_size=cfg.vocab_size,
                                 shift_num=cfg.shift_vocab_num)
            if topk == 0:
                m = bow > 0 if activate_lexical \
                    else jnp.zeros_like(bow, dtype=jnp.bool_)
            elif topk is None or topk == -1:
                m = jnp.ones_like(bow, dtype=jnp.bool_)
            else:
                tk = build_topk_mask(emb, k=topk)
                m = jnp.logical_or(tk, bow > 0) if activate_lexical else tk
            return emb * m

        return jax.jit(fn)

    def _make_bow_fn(self):
        cfg = self.config

        def fn(variables, ids, ttype, mask):
            return build_bow_mask(ids, vocab_size=cfg.vocab_size,
                                  shift_num=cfg.shift_vocab_num,
                                  norm=cfg.norm)

        return jax.jit(fn)

    # -- public API --------------------------------------------------------
    def embed(self, texts: Union[str, List[str]], batch_size: int = 128,
              max_len: Optional[int] = None, topk: Optional[int] = "cfg",
              bow: bool = False, activate_lexical: bool = True,
              **_ignored) -> np.ndarray:
        """Embed texts into [N, V - shift] sparse lexical vectors.

        topk semantics follow the reference (src/ir/encoder/vdr.py:117-120):
        0 -> only lexical (present-token) dims; None or -1 -> all dims;
        k -> top-k dims (plus lexical dims when ``activate_lexical``).
        """
        if isinstance(texts, str):
            texts = [texts]
        max_len = max_len or self.config.max_len
        if topk == "cfg":
            topk = self.config.topk
        if topk is not None and topk > 0:
            # clamp like embed_sparse/the image encoder: lax.top_k
            # rejects k > dim, and clamping BEFORE the jit-cache key
            # avoids duplicate compiles for oversized values
            topk = min(topk, self.config.out_dim)
        if bow:
            key = "bow"
            make = lambda L: self._make_bow_fn()
        else:
            key = ("emb", topk, activate_lexical)
            make = lambda L: self._make_embed_fn(topk, activate_lexical)
        return self._run_batches(texts, batch_size, max_len, key, make)

    def embed_sparse(self, texts: Union[str, List[str]],
                     batch_size: int = 128,
                     max_len: Optional[int] = None,
                     topk: Optional[int] = None,
                     activate_lexical: bool = False,
                     return_device: bool = False
                     ) -> "tuple[np.ndarray, np.ndarray]":
        """Embed directly into compact sparse form: (cols [N, k] int32
        sentinel-padded, vals [N, k] f32).

        The dense [N, V] never leaves the device — for corpus indexing
        this is ~40x less host memory and device->host traffic than
        ``embed`` + host sparsification. k is ``topk`` rounded up to the
        lexical-union bound when ``activate_lexical``.

        ``return_device=True`` keeps the result as device arrays so a
        downstream consumer (the beta-rerank scorer) can use them
        without ever paying the device->host transfer. In that mode the
        row count is padded UP to a multiple of ``batch_size`` (trailing
        rows are garbage from pad inputs): downstream jit consumers then
        see one shape per size bucket instead of one per exact N, which
        would recompile on every serve request.
        """
        if isinstance(texts, str):
            texts = [texts]
        max_len = max_len or self.config.max_len
        if topk is None:
            # `or` would also swallow an explicit topk=0; 0 has no
            # meaning here (indexing needs weighted dims), so reject
            topk = self.config.topk
        if topk <= 0:
            raise ValueError(
                "embed_sparse needs topk >= 1 (use embed(topk=0) for "
                "lexical-only dense masks)")
        cfg = self.config
        topk = min(topk, cfg.out_dim)  # lax.top_k rejects k > dim
        k_out = min(topk + (max_len if activate_lexical else 0),
                    cfg.out_dim)

        def make(L):
            def fn(variables, ids, ttype, mask):
                emb = self.module.apply(variables, ids, ttype, mask)
                if activate_lexical:
                    bow = build_bow_mask(ids, vocab_size=cfg.vocab_size,
                                         shift_num=cfg.shift_vocab_num)
                    tk = build_topk_mask(emb, k=topk)
                    emb = emb * jnp.logical_or(tk, bow > 0)
                    vals, cols = jax.lax.top_k(emb, k_out)
                else:
                    vals, cols = jax.lax.top_k(emb, k_out)
                # zero entries -> sentinel column (mask-free scoring)
                cols = jnp.where(vals > 0, cols, cfg.out_dim)
                vals = jnp.where(vals > 0, vals, 0.0)
                return cols.astype(jnp.int32), vals

            return jax.jit(fn)

        if return_device:
            outs = self._pipeline_batches(
                texts, batch_size, max_len,
                ("emb_sparse", topk, activate_lexical), make,
                lambda out, n: out)
            if len(outs) == 1:
                return outs[0]
            return (jnp.concatenate([c for c, _ in outs]),
                    jnp.concatenate([v for _, v in outs]))
        outs = self._pipeline_batches(
            texts, batch_size, max_len,
            ("emb_sparse", topk, activate_lexical), make,
            lambda out, n: (np.asarray(out[0][:n]),
                            np.asarray(out[1][:n])))
        return (np.concatenate([c for c, _ in outs]),
                np.concatenate([v for _, v in outs]))

    def disentangle(self, text: str, topk: int = 768, visual: bool = False,
                    save_file: Optional[str] = None) -> Dict[str, float]:
        """Top-k (token -> weight) interpretation of an embedding
        (reference: src/ir/encoder/vdr.py:181-192)."""
        emb = self.embed(text)[0]
        k = min(topk, emb.shape[-1])
        idx = np.argsort(-emb)[:k]
        idx = [int(i) for i in idx if emb[i] != 0]
        token_ids = [i + self.config.shift_vocab_num for i in idx]
        tokens = self.tokenizer.convert_ids_to_tokens(token_ids)
        results = dict(zip(tokens, [float(emb[i]) for i in idx]))
        if visual:
            from ..utils.vis import wordcloud_from_dict
            wordcloud_from_dict(results, max_words=topk, save_file=save_file)
        return results

    dst = disentangle
