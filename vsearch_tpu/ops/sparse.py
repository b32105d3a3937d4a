"""Vocabulary-space sparsification primitives.

TPU-native counterparts of the reference's torch scatter/topk helpers
(reference: src/ir/utils/sparse.py:8-43). Everything here is static-shape,
jit-able jnp code; the scatter patterns of the reference become one-hot
segment ops / ``at[].set`` updates that XLA fuses on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def build_topk_mask(embs: jax.Array, k: int = 768, axis: int = -1) -> jax.Array:
    """Boolean mask marking the top-``k`` entries along ``axis``.

    Counterpart of reference src/ir/utils/sparse.py:8-14 (torch.topk +
    scatter_). Implemented with ``jax.lax.top_k`` + one-hot scatter via
    ``at[].set`` so the whole thing stays on-device with static shapes.
    """
    if axis != -1 and axis != embs.ndim - 1:
        embs_moved = jnp.moveaxis(embs, axis, -1)
        mask = build_topk_mask(embs_moved, k=k, axis=-1)
        return jnp.moveaxis(mask, -1, axis)
    # clamp in the shared helper so every caller (loss sparsify, embed
    # paths) tolerates k > dim instead of each carrying its own guard
    k = min(k, embs.shape[-1])
    _, idx = jax.lax.top_k(embs, k)  # [..., k]
    mask = jnp.zeros(embs.shape, dtype=jnp.bool_)
    mask = jnp.put_along_axis(mask, idx, True, axis=-1, inplace=False)
    return mask


def topk_sparsify(emb_dense: jax.Array, k: int, axis: int = -1) -> jax.Array:
    """Zero out everything but the top-``k`` entries along ``axis``.

    Counterpart of reference src/ir/utils/sparse.py:16-19.
    """
    return emb_dense * build_topk_mask(emb_dense, k=k, axis=axis)


def build_bow_mask(
    text_ids: jax.Array,
    vocab_size: int = 30522,
    shift_num: int = 0,
    norm: bool = False,
    dtype=jnp.float32,
) -> jax.Array:
    """Binary bag-of-words vector [N, vocab_size - shift_num] from token ids.

    Counterpart of reference src/ir/utils/sparse.py:21-29 (zeros + scatter_).
    The torch scatter becomes a vectorized one-hot reduction; padded/special
    tokens with id < shift_num fall off after the shift slice, matching the
    reference's ``bow_mask[:, shift_num:]`` semantics (any token id scatters
    into the full [N, V] buffer first, then the first ``shift_num`` columns
    are dropped).
    """
    n = text_ids.shape[0]
    full = jnp.zeros((n, vocab_size), dtype=jnp.bool_)
    # scatter token ids -> True.  put_along_axis handles duplicate ids fine
    # for a constant update value.
    full = jnp.put_along_axis(full, text_ids, True, axis=-1, inplace=False)
    if shift_num > 0:
        full = full[:, shift_num:]
    bow = full.astype(dtype)
    if norm:
        denom = jnp.linalg.norm(bow, axis=-1, keepdims=True)
        bow = bow / jnp.maximum(denom, 1e-12)
    return bow


def init_cts_mask_like(embs: jax.Array) -> jax.Array:
    """Round-robin assignment of vocab slots to batch rows.

    Counterpart of reference src/ir/utils/sparse.py:32-36: slot ``v`` is
    assigned to row ``v % batch_size``.
    """
    batch_size, vocab_size = embs.shape
    slot_owner = jnp.arange(vocab_size) % batch_size
    return slot_owner[None, :] == jnp.arange(batch_size)[:, None]


def build_cts_mask(bow_embs: jax.Array) -> jax.Array:
    """Contrastive-mask regularizer: per-row vocab slots NOT present in the
    batch's bag-of-words union.

    Counterpart of reference src/ir/utils/sparse.py:39-43.
    """
    bow_batch = bow_embs.sum(0) > 0  # [V] union of active slots
    cts_init = init_cts_mask_like(bow_embs)
    return cts_init & ~bow_batch[None, :]
