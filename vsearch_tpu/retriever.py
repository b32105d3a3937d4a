"""Retriever: the top-level user API (embed, index, search, rerank).

TPU-native rebuild of the reference ``Retriever``
(reference: src/ir/retriever/retriever.py:24-348): bi-encoder +
dense/sparse/bag-of-token index, alpha (parametric) and beta
(semi-parametric, binary-index + on-the-fly rerank) search, in-training
negative retrieval, tokenizer-only BoT index construction.
"""
from __future__ import annotations

import dataclasses
import logging
import random as pyrandom
from typing import Any, List, Optional, Sequence, Union

import numpy as np

from .biencoder import BiEncoder, BiEncoderConfig
from .eval.qa_utils import has_answer
from .index import (BoTIndex, DenseIndex, IndexType, SearchResults,
                    SparseIndex)
from .ops.ell import ELLMatrix

logger = logging.getLogger(__name__)


def _normalize_text(text: str) -> str:
    """Unicode-quote/newline normalization applied to passages
    (reference: src/ir/data/biencoder_dataset.py:27-29)."""
    import unicodedata

    text = text.replace("’", "'").replace("\n", " ")
    return unicodedata.normalize("NFD", text)


@dataclasses.dataclass
class RetrieverConfig(BiEncoderConfig):
    pass


class Retriever(BiEncoder):
    """Bi-encoder with an attached index (reference retriever.py:24-31)."""

    config_class = RetrieverConfig

    def __init__(self, config: RetrieverConfig, index=None, **kwargs):
        super().__init__(config, **kwargs)
        self.index = index
        self.index_type: Optional[IndexType] = (
            index.index_type if index is not None else None)

    def to_mesh(self, mesh, axis_name: str = "dp"):
        """Distribute serving over a device mesh: index rows shard
        (per-shard top-k merged over ICI) and the beta-rerank candidate
        re-embedding runs data-parallel over the same axis. Goes beyond
        the reference, which serves from one device
        (reference index.py:163-179)."""
        if self.index is not None and hasattr(self.index, "to_mesh"):
            self.index.to_mesh(mesh, axis_name)
        for enc in {id(self.encoder_q): self.encoder_q,
                    id(self.encoder_p): self.encoder_p}.values():
            if hasattr(enc, "to_mesh"):
                enc.to_mesh(mesh, axis_name)
        return self

    # -- query processing (reference retriever.py:74-104) ------------------
    def process_query(self, queries, dropout: float = 0.0,
                      a: Optional[int] = None, batch_size: int = 32,
                      rng: Optional[np.random.Generator] = None
                      ) -> np.ndarray:
        # DPR configs have no topk (dense embeddings aren't sparsified)
        num_activation = (a if a is not None
                          else getattr(self.encoder_q.config, "topk",
                                       None))
        if isinstance(queries, str):
            q_emb = self.encoder_q.embed([queries], batch_size=batch_size,
                                         topk=num_activation)
        elif isinstance(queries, list) and queries and isinstance(
                queries[0], str):
            q_emb = self.encoder_q.embed(queries, batch_size=batch_size,
                                         topk=num_activation)
        else:
            q_emb = np.asarray(queries, dtype=np.float32)
        if dropout:
            rng = rng or np.random.default_rng()
            keep = rng.random(q_emb.shape) >= dropout
            q_emb = q_emb * keep / (1.0 - dropout)
        return np.asarray(q_emb)

    # -- retrieval (reference retriever.py:107-148) ------------------------
    def retrieve(self, queries, k: int = 5, dropout: float = 0.0,
                 a: Optional[int] = None, index=None, rerank: bool = False,
                 batch_size: int = 32, rng=None) -> SearchResults:
        """Top-k retrieval; ``rerank=True`` runs beta search on a
        bag-of-token index: first-stage binary-index hits are re-embedded
        on the fly and re-scored parametrically. ``rng`` (a numpy
        Generator) makes query ``dropout`` reproducible."""
        index = index if index is not None else self.index
        assert index is not None, "no index attached"
        q_emb = self.process_query(queries, dropout, a,
                                   batch_size=batch_size, rng=rng)
        results = index.search(q_emb, k=k)
        if rerank and index.index_type == IndexType.BAG_OF_TOKEN:
            results = self._beta_rerank(q_emb, results, index, k,
                                        batch_size)
        return results

    def _beta_rerank(self, q_emb: np.ndarray, results: SearchResults,
                     index, k: int, batch_size: int) -> SearchResults:
        """Second stage of beta search (reference retriever.py:137-147):
        embed the retrieved texts and re-score against the query.

        Uses the compact sparse embedding when available: candidate
        passages come back as (cols, vals) pairs (~topk floats each)
        instead of dense [B*k, V] vectors, so reranking B x k candidates
        moves ~100x less data off the device."""
        ret_ids = np.asarray(results.ids)  # [B, k]
        k = ret_ids.shape[1]  # the index may have clamped k to its rows
        b = q_emb.shape[0]
        # cross-query candidate dedup: similar queries share candidates,
        # and each re-embedding costs a full encoder forward — embed
        # every distinct passage once and gather per (query, slot)
        uniq_ids, inverse = np.unique(ret_ids.reshape(-1),
                                      return_inverse=True)
        ret_texts = [_passage_embed_text(index.get_sample(int(i)))
                     for i in uniq_ids]
        # length-sort the unique candidates so each embed batch lands in
        # the smallest length bucket (word count ~ token count); the
        # inverse map composes the sort away. With the native masked
        # pooling embeddings are batch-order-invariant, so results are
        # unchanged; under compat_pad_pooling batch composition already
        # shifted with dedup (the reference defines no canonical rerank
        # batching), and scores move only within pad-pooling noise.
        sort_perm = np.argsort([len(t.split()) for t in ret_texts],
                               kind="stable")
        ret_texts = [ret_texts[int(i)] for i in sort_perm]
        inverse = np.argsort(sort_perm, kind="stable")[inverse]
        q32 = np.asarray(q_emb, dtype=np.float32)
        if hasattr(self.encoder_p, "embed_sparse"):
            # activate_lexical=True matches the reference's default
            # embed() masking for the rerank stage (retriever.py:140).
            # Candidate embeddings stay ON DEVICE and rescoring runs
            # there too: only the [b, k] score matrix comes back,
            # instead of (cols, vals) at ~7 KB per candidate (measured
            # +25% beta QPS over a slow host link). Under a mesh the
            # embeds are row-sharded and the rescore gather rides ICI,
            # which still beats a device->host round trip per batch.
            cols, vals = self.encoder_p.embed_sparse(
                ret_texts, batch_size=batch_size, activate_lexical=True,
                return_device=True)
            rescored = np.asarray(_sparse_rerank_scores(
                cols, vals, inverse, b, k,
                np.ascontiguousarray(q32)))
        else:
            p_emb = self.encoder_p.embed(ret_texts,
                                         batch_size=batch_size)
            p_emb = p_emb[inverse].reshape(b, k, -1)
            rescored = np.einsum("bkv,bv->bk",
                                 p_emb.astype(np.float32), q32)
        order = np.argsort(-rescored, axis=1)
        new_ids = np.take_along_axis(ret_ids, order, axis=1)
        new_scores = np.take_along_axis(rescored, order, axis=1)
        return SearchResults(new_ids, new_scores)

    # -- negative mining (reference retriever.py:150-205) ------------------
    def retrieve_negatives(self, q_emb, answers: List[List[str]],
                           ret_neg_num: int = 1, ret_topk: int = 100,
                           pool_size: int = 20, ret_dropout: float = 0.0,
                           index=None, seed: Optional[int] = None
                           ) -> List[List[str]]:
        """Mine in-training negatives: retrieve top-k, drop
        answer-containing passages, sample ``ret_neg_num`` per query."""
        index = index if index is not None else self.index
        assert index is not None, "no index found"
        assert answers, "no answer strings found"
        if not (isinstance(q_emb, str) or (
                isinstance(q_emb, list) and q_emb
                and isinstance(q_emb[0], str))):
            # embeddings normalize to an array; string queries must
            # reach process_query untouched (np.asarray would turn
            # them into an np.str_ array that the embedding branch
            # then tries to cast to float)
            q_emb = np.asarray(q_emb)
        # the seed covers BOTH the sampling below and the query-dropout
        # rng: otherwise mining with ret_dropout > 0 was irreproducible
        # despite a fixed seed
        results = self.retrieve(
            q_emb, a=768, k=ret_topk, dropout=ret_dropout, index=index,
            rng=np.random.default_rng(seed) if seed is not None else None)
        rnd = pyrandom.Random(seed)
        batch_neg_texts: List[List[str]] = []
        for sample_id, sample_ret in enumerate(np.asarray(results.ids)):
            pool: List[int] = []
            for ret_ind in sample_ret.tolist():
                text = _passage_text(index.get_sample(ret_ind))
                if not has_answer(answers[sample_id], text, "string"):
                    pool.append(ret_ind)
                if len(pool) >= pool_size:
                    break
            if len(pool) < ret_neg_num:
                pad = ret_neg_num - len(pool)
                pool += rnd.sample(range(len(index)), pad)
            chosen = rnd.sample(pool, ret_neg_num)
            batch_neg_texts.append(
                [_normalize_text(_passage_text(index.get_sample(i)))
                 for i in chosen])
        return batch_neg_texts

    # reference public API misspelling kept as an alias for drop-in parity
    retireve_negatives = retrieve_negatives

    # -- index building (reference retriever.py:208-317) -------------------
    def _build_bot_ell(self, texts: Sequence[str], batch_size: int = 32,
                       max_len: int = 128, max_token: Optional[int] = None,
                       num_shift: Optional[int] = None):
        """Tokenizer-only bag-of-token vectors, built directly into ELL
        (no dense [B, V] staging buffer, reference retriever.py:208-253)."""
        from .index.bot_build import build_bot_ell

        tokenizer = self.encoder_p.tokenizer
        shift = (num_shift if num_shift is not None
                 else getattr(self.encoder_p.config, "shift_vocab_num", 0))
        return build_bot_ell(tokenizer, list(texts), max_len=max_len,
                             shift=shift, batch_size=batch_size,
                             max_token=max_token,
                             vocab_size=tokenizer.vocab_size,
                             return_host=True)

    def _build_embedding_vectors(self, texts: Sequence[str],
                                 batch_size: int = 32,
                                 max_len: Optional[int] = None,
                                 num_shift: int = 0) -> np.ndarray:
        emb = self.encode_corpus(list(texts), batch_size=batch_size,
                                 max_len=max_len)
        if num_shift:
            emb = emb[:, num_shift:]
        return emb

    def build_index(self, texts: Sequence[str], batch_size: int = 32,
                    index_type: Union[str, IndexType] = IndexType.DENSE,
                    max_len: Optional[int] = None):
        if isinstance(index_type, str):
            index_type = IndexType(index_type.lower())
        texts = list(texts)
        if index_type == IndexType.DENSE:
            index = DenseIndex()
            index.set_vectors(self._build_embedding_vectors(
                texts, batch_size=batch_size, max_len=max_len))
        elif index_type == IndexType.SPARSE:
            index = SparseIndex()
            if hasattr(self.encoder_p, "embed_sparse"):
                # fused device path: topk happens on-device and only the
                # compact (cols, vals) cross the host boundary. Join
                # dict corpora exactly like encode_corpus does so the
                # fused path embeds the same strings as the dense path
                from .biencoder import join_corpus

                cols, vals = self.encoder_p.embed_sparse(
                    join_corpus(texts), batch_size=batch_size,
                    max_len=max_len)
                from .ops.ell import ell_from_topk
                index.set_ell(ell_from_topk(
                    cols, vals, self.encoder_p.config.out_dim))
            else:
                dense = self._build_embedding_vectors(
                    texts, batch_size=batch_size, max_len=max_len)
                index.set_ell(ELLMatrix.from_dense(dense,
                                                   val_dtype=np.float32))
        elif index_type == IndexType.BAG_OF_TOKEN:
            index = BoTIndex()
            # the reference tokenizes raw entries and crashes on dict
            # corpora (retriever.py:239 hands dicts to the tokenizer);
            # intended behavior is the encode_corpus joining
            from .biencoder import join_corpus

            ell, cols_np, nnz_np = self._build_bot_ell(
                join_corpus(texts), batch_size=batch_size,
                max_len=max_len or 128)
            index.set_ell(ell, host_cache=(cols_np, nnz_np))
        else:
            raise NotImplementedError(index_type)
        index.data = texts
        self.index = index
        self.index_type = index_type
        return index

    # -- persistence (reference retriever.py:319-348) ----------------------
    def save_index(self, path: str):
        self.index.save(path)

    def load_index(self, index_file: Optional[str] = None,
                   data_file: Optional[str] = None,
                   index_type: Union[None, str, IndexType] = None,
                   search_mode: Optional[str] = None):
        """``search_mode`` (sparse/BoT only) picks the scoring path —
        'auto' | 'exact' | 'bitpack' | 'block' | 'stream'
        (the latter two are BoT >HBM tiers; see index.BoTIndex). It
        must be set at load time: it decides whether the ELL lands on
        device or stays host-resident."""
        if index_file is None:
            raise ValueError(
                "load_index requires index_file (a path or glob)")
        if index_type is None:
            if index_file.endswith(".pt") or index_file.endswith(".npy"):
                index_type = IndexType.DENSE
            elif index_file.endswith(".bot.npz"):
                index_type = IndexType.BAG_OF_TOKEN
            elif index_file.endswith(".ell.npz"):
                # native ELL archives self-describe: no stored values
                # means a binary bag-of-token index (reference builds
                # BoT as all-ones CSR; here binary is structural)
                from .index.base import _resolve_files

                with np.load(_resolve_files(index_file)[0]) as z:
                    index_type = (IndexType.SPARSE if "vals" in z.files
                                  else IndexType.BAG_OF_TOKEN)
            elif index_file.endswith(".npz"):
                index_type = IndexType.SPARSE
            else:
                raise ValueError(
                    "cannot infer index type from file extension; pass "
                    "index_type explicitly")
        elif isinstance(index_type, str):
            index_type = IndexType(index_type.lower())
        elif not isinstance(index_type, IndexType):
            raise TypeError("index_type must be IndexType or str")
        self.index_type = index_type
        if index_type == IndexType.DENSE:
            if search_mode is not None:
                raise ValueError(
                    "search_mode applies to sparse/bag-of-token "
                    "indexes; dense indexes always score exactly")
            self.index = DenseIndex(index_file, data_file)
        elif index_type == IndexType.SPARSE:
            self.index = SparseIndex(
                index_file, data_file,
                **({"search_mode": search_mode}
                   if search_mode is not None else {}))
        elif index_type == IndexType.BAG_OF_TOKEN:
            self.index = BoTIndex(
                index_file, data_file,
                **({"search_mode": search_mode}
                   if search_mode is not None else {}))
        else:
            raise NotImplementedError(index_type)
        return self.index


def _sparse_rerank_scores(cols, vals, inverse: np.ndarray, b: int, k: int,
                          q32: np.ndarray):
    """On-device beta-rerank rescoring.

    ``cols``/``vals`` are the deduped candidate embeddings in compact
    sparse form, still on device (rows may be padded past the real
    count — see ``embed_sparse(return_device=True)``); ``inverse`` maps
    each (query, slot) to its candidate row. Only the [b, k] score
    matrix crosses back to the host, instead of (cols, vals) at ~7 KB
    per candidate. Sentinel columns (== V) hit the zero pad column.
    """
    inv_bk = inverse.astype(np.int32).reshape(b, k)
    return _sparse_rerank_scores_jit(cols, vals, inv_bk, q32)


def _make_sparse_rerank_jit():
    import jax
    import jax.numpy as jnp

    def score(cols, vals, inv_bk, q):
        qpad = jnp.pad(q, ((0, 0), (0, 1)))
        c = jnp.take(cols, inv_bk, axis=0)          # [b, k, kk]
        v = jnp.take(vals, inv_bk, axis=0).astype(jnp.float32)
        c = jnp.minimum(c, q.shape[1])
        g = jnp.take_along_axis(qpad[:, None, :], c, axis=2)
        return jnp.sum(g * v, axis=2)

    return jax.jit(score)


_sparse_rerank_scores_jit = _make_sparse_rerank_jit()


def _passage_text(sample: Any) -> str:
    """Extract text from an index data record (str or jsonl dict)."""
    if isinstance(sample, str):
        return sample
    if isinstance(sample, dict):
        return sample.get("text") or sample.get("contents") or ""
    return str(sample)


def _passage_embed_text(sample: Any) -> str:
    """The string the INDEX embedded for this record: dict corpora are
    built via join_corpus ("title [SEP] text"), so the beta-rerank
    stage must re-embed the SAME string — text-only would mis-score
    candidates whose title carries the matching terms."""
    if isinstance(sample, dict) and sample.get("title"):
        return f"{sample['title']} [SEP] {_passage_text(sample)}"
    return _passage_text(sample)
