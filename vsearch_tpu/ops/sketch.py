"""Random-projection sketch scoring: the MXU-native sparse search path.

TPU has no fast scattered-memory gather (Mosaic's dynamic_gather is a
single-register shuffle), so CSR-style sparse scoring — the reference's
torch.sparse GPU path (reference: src/ir/retriever/index.py:88-94) —
cannot go fast on the VPU. The TPU-native design is ScaNN-style:

  1. at build time, project every sparse row onto a fixed seeded
     Rademacher matrix R [V+1, d] -> dense sketch S [N, d] bf16;
  2. at query time, one MXU matmul  (q @ R) @ S^T  scores all rows,
     approx-top-C selects candidates;
  3. an exact gather-rerank over only B x C candidate rows (tiny)
     restores exact top-k order.

Unbiased: E[(qR)(pR)^T] = q p^T with variance ~ ||q||^2 ||p||^2 / d, so
candidate recall is controlled by d and C (both configurable); the final
top-k is exact over the candidate set.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .ell import ELLMatrix


def make_projection(num_cols: int, d: int = 512, seed: int = 42,
                    dtype=jnp.float32) -> jax.Array:
    """Seeded Rademacher projection R [num_cols + 1, d] (last row is the
    sentinel column -> zeros)."""
    key = jax.random.PRNGKey(seed)
    signs = jax.random.rademacher(key, (num_cols, d), dtype=dtype)
    r = signs / jnp.sqrt(jnp.asarray(d, dtype))
    return jnp.concatenate([r, jnp.zeros((1, d), dtype)], axis=0)


def sketch_ell(ell: ELLMatrix, R: jax.Array,
               dtype=jnp.bfloat16,
               chunk_rows: int = 65536) -> jax.Array:
    """S[n] = sum_j vals[n, j] * R[cols[n, j]]  -> [N, d].

    Row-gathers of contiguous d-vectors (embedding-lookup pattern), which
    the TPU handles well; runs once at index build. Rows are processed
    in ``chunk_rows`` blocks via ``lax.map`` so the f32 accumulator
    peaks at [chunk, d] (~256 MB at d=1024) instead of [N, d] — a
    21M-row index would otherwise need an 86 GB accumulator, OOMing at
    exactly the scale the sketch path exists for.
    """
    nnz_pad = ell.nnz_pad
    n = ell.cols.shape[0]
    d = R.shape[1]

    if not ell.sentinel_padded:
        raise ValueError("sketch_ell requires sentinel-padded ELL")

    chunk = min(chunk_rows, max(n, 1))
    n_pad = -(-n // chunk) * chunk
    cols = ell.cols
    vals = ell.vals
    if n_pad != n:
        cols = jnp.pad(cols, ((0, n_pad - n), (0, 0)),
                       constant_values=ell.num_cols)  # sentinel rows
        if vals is not None:
            vals = jnp.pad(vals, ((0, n_pad - n), (0, 0)))
    cols_b = cols.reshape(n_pad // chunk, chunk, nnz_pad)
    vals_b = (None if vals is None
              else vals.reshape(n_pad // chunk, chunk, nnz_pad))

    def chunk_fn(args):
        cols_c = args[0] if vals_b is not None else args
        vals_c = args[1] if vals_b is not None else None

        def body(j, acc):
            contrib = jnp.take(R, cols_c[:, j], axis=0)  # [chunk, d]
            if vals_c is not None:
                contrib = contrib * vals_c[:, j][:, None]
            return acc + contrib

        s = jax.lax.fori_loop(0, nnz_pad, body,
                              jnp.zeros((chunk, d), R.dtype))
        return s.astype(dtype)

    blocks = jax.lax.map(chunk_fn,
                         (cols_b, vals_b) if vals_b is not None
                         else cols_b)
    return blocks.reshape(n_pad, d)[:n]


def project_queries(q: jax.Array, R: jax.Array) -> jax.Array:
    """q~ = q @ R[:V] for dense queries [B, V]."""
    return jax.lax.dot_general(
        q, R[:-1], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def exact_rerank(q: jax.Array, ell: ELLMatrix, cand: jax.Array, k: int
                 ) -> Tuple[jax.Array, jax.Array]:
    """Exact scores for candidate rows only; returns (ids, scores) [B, k].

    One flat element-gather of B*C*nnz_pad query values — small enough
    that the TPU's slow scattered reads don't matter.
    """
    b, c = cand.shape
    nnz_pad = ell.nnz_pad
    v1 = ell.num_cols + 1
    crows = jnp.take(ell.cols, cand.reshape(-1), axis=0
                     ).reshape(b, c, nnz_pad)
    qp = jnp.pad(q.astype(jnp.float32), ((0, 0), (0, 1)))  # [B, V+1]
    offs = (jnp.arange(b, dtype=jnp.int32) * v1)[:, None, None]
    g = jnp.take(qp.reshape(-1), (crows + offs).reshape(-1)
                 ).reshape(b, c, nnz_pad)
    if ell.vals is not None:
        cvals = jnp.take(ell.vals, cand.reshape(-1), axis=0
                         ).reshape(b, c, nnz_pad)
        g = g * cvals.astype(g.dtype)
    elif not ell.sentinel_padded:
        cnnz = jnp.take(ell.nnz, cand.reshape(-1)).reshape(b, c)
        valid = (jnp.arange(nnz_pad)[None, None, :]
                 < cnnz[:, :, None]).astype(g.dtype)
        g = g * valid
    scores = g.sum(axis=-1)  # [B, C]
    top_scores, pos = jax.lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(cand, pos, axis=1)
    return top_ids, top_scores


def two_stage_search(q: jax.Array, ell: ELLMatrix, sketch: jax.Array,
                     R: jax.Array, k: int, num_candidates: int,
                     recall_target: float = 0.95, rerank: bool = True
                     ) -> Tuple[jax.Array, jax.Array]:
    """Sketch-matmul candidates (+ optional exact rerank). One XLA program.

    With ``rerank=False`` the sketch scores rank directly (fastest;
    ranking error ~ ||q||*||p||/sqrt(d)). With ``rerank=True`` the top
    ``num_candidates`` are exactly re-scored — the TPU's scalar-gather
    rate (~1e8/s) prices this at roughly B*C*nnz_pad/1e8 seconds, so keep
    B*C*nnz_pad around a few million.
    """
    qs = project_queries(q.astype(jnp.float32), R).astype(sketch.dtype)
    s1 = jax.lax.dot_general(
        qs, sketch, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [B, N]
    if not rerank:
        scores, cand = jax.lax.approx_max_k(s1, k,
                                            recall_target=recall_target)
        return cand, scores
    _, cand = jax.lax.approx_max_k(s1, num_candidates,
                                   recall_target=recall_target)
    return exact_rerank(q, ell, cand, k)


def binary_proxy_search(q: jax.Array, ell: ELLMatrix, bitmat, k: int,
                        num_candidates: int,
                        interpret=None) -> Tuple[jax.Array, jax.Array]:
    """Two-stage search for large REAL-VALUED sparse indexes.

    Stage 1 scores the rows' binary SUPPORT (which vocab dims are
    nonzero) with the bit-packed MXU kernel — for VDR embeddings this is
    exactly the q x p_bin semi-parametric interaction the 4-term training
    loss aligns with q x p (reference loss_utils.py:175-198), so its
    candidate recall is semantically grounded, unlike a random JL sketch.
    Stage 2 exactly re-scores the top candidates from the weighted ELL.
    """
    from .bitpack import (BUCKET, bitpack_bucketed_topk,
                          bitpack_scores)

    # fused bucketed selection: the [B, N] support-score matrix never
    # reaches HBM; candidate count is capped by the bucket structure
    # AND the true row count (the padded row count would let a small
    # index through to a top_k larger than its real rows)
    capped = min(num_candidates, bitmat.words.shape[0] // BUCKET,
                 bitmat.num_rows)
    if capped < k:
        # the bucket structure can't yield k distinct candidates
        # (large k on a small/medium index) — fall back to exact
        # selection over the support scores rather than crashing the
        # rerank's top_k with fewer candidates than results
        scores = bitpack_scores(q, bitmat,
                                interpret=interpret)[:, : ell.shape[0]]
        c = min(max(num_candidates, k), scores.shape[1])
        _, cand = jax.lax.top_k(scores, c)
        return exact_rerank(q, ell, cand, k)
    cand, _ = bitpack_bucketed_topk(q, bitmat, k=capped,
                                    interpret=interpret)
    return exact_rerank(q, ell, cand, k)


def exact_search(q: jax.Array, ell: ELLMatrix, k: int,
                 chunk_rows: int = 65536
                 ) -> Tuple[jax.Array, jax.Array]:
    """Exact chunked gather scoring for small/medium indexes.

    Materializes at most [B, chunk, nnz_pad] per step; bandwidth-bound on
    the TPU's scalar-gather path, so prefer the sketch path at scale.
    """
    from .ell import ell_matvec_chunked

    scores = ell_matvec_chunked(q, ell, chunk_rows)
    k = min(k, scores.shape[1])
    s, i = jax.lax.top_k(scores, k)
    return i, s
