"""Top-k scoring/search primitives shared by every index type.

Counterpart of the reference's ``Index.search`` (torch matmul + topk,
reference: src/ir/retriever/index.py:88-94), rebuilt for XLA: static-k
``jax.lax.top_k`` fused after the scoring matmul, plus a shard-merge
helper for mesh-sharded indexes (per-shard top-k -> gather -> re-top-k,
the ICI-friendly alternative to vstacking shards on one device).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def dense_topk_search(q: jax.Array, vectors: jax.Array, k: int,
                      precision=jax.lax.Precision.HIGHEST,
                      approx: bool = False,
                      recall_target: float = 0.99,
                      ) -> Tuple[jax.Array, jax.Array]:
    """scores = q @ vectors.T, then top-k. Returns (ids, scores) [B, k].

    Keeps the matmul in the input dtype (bf16 recommended) but accumulates
    in f32 via ``preferred_element_type`` so MXU tiles cleanly. With bf16
    inputs ``precision`` is a no-op; with f32 inputs HIGHEST keeps full
    f32 accuracy (at 3x MXU passes) — pass DEFAULT for speed.

    ``approx=True`` uses TPU-native ``approx_max_k`` for the selection
    (bucketed max; handles negative scores, unlike the bit-packed
    kernel's key trick). Off-TPU it falls back to exact top_k.
    """
    scores = jax.lax.dot_general(
        q, vectors,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if approx and jax.default_backend() == "tpu":
        top_scores, top_ids = jax.lax.approx_max_k(
            scores, k, recall_target=recall_target)
    else:
        top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_ids, top_scores


def topk_from_scores(scores: jax.Array, k: int
                     ) -> Tuple[jax.Array, jax.Array]:
    """(ids, scores) of the top-k entries along the last axis."""
    top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_ids, top_scores


def merge_shard_topk(shard_ids: jax.Array, shard_scores: jax.Array, k: int,
                     ) -> Tuple[jax.Array, jax.Array]:
    """Merge per-shard top-k candidate lists into a global top-k.

    shard_ids/scores: [S, B, k_local] where ids are already *global* row
    ids (each shard offsets its local ids by its row offset). Concatenate
    the S candidate lists and re-top-k: O(S*k) per query instead of
    shipping full score rows — this is what rides ICI in the sharded
    search path.
    """
    s, b, kl = shard_ids.shape
    ids_flat = jnp.moveaxis(shard_ids, 0, 1).reshape(b, s * kl)
    scores_flat = jnp.moveaxis(shard_scores, 0, 1).reshape(b, s * kl)
    top_scores, pos = jax.lax.top_k(scores_flat, k)
    top_ids = jnp.take_along_axis(ids_flat, pos, axis=1)
    return top_ids, top_scores
