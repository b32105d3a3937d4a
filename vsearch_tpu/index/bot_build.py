"""Bag-of-token index construction: tokenizer-only, neural-network-free.

Counterpart of the reference's ``_build_bot_vectors``
(reference: src/ir/retriever/retriever.py:208-253), which scatters into a
dense [B, V] torch buffer and converts to CSR. Here tokens go straight
into the static-shape ELL layout (cols + nnz, no values — binary), which
is both the on-device format and ~7x smaller than a dense staging buffer.
The build is embarrassingly parallel over texts; ``num_workers`` fans out
over processes for multi-core hosts.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _encode_chunk(tokenizer, texts: Sequence[str], max_len: int,
                  shift: int, cap: int, nnz_pad: int, sentinel: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    if hasattr(tokenizer, "encode_bot_batch"):
        # fused C++ path: tokenize + first-N-unique + shift in one call
        return tokenizer.encode_bot_batch(texts, max_len=max_len,
                                          shift=shift, cap=cap,
                                          nnz_pad=nnz_pad,
                                          pad_value=sentinel)
    n = len(texts)
    cols = np.full((n, nnz_pad), sentinel, dtype=np.int32)
    nnz = np.zeros(n, dtype=np.int32)
    id_lists = tokenizer.encode_batch(texts, max_length=max_len)
    for i, ids in enumerate(id_lists):
        seen: Dict[int, None] = {}
        for t in ids:
            if t >= shift and t not in seen:
                seen[t] = None
                if len(seen) >= cap:
                    break
        row = np.fromiter(seen.keys(), dtype=np.int32, count=len(seen))
        cols[i, : row.size] = row - shift
        nnz[i] = row.size
    return cols, nnz


def _worker(args):
    (vocab_payload, texts, max_len, shift, cap, nnz_pad, sentinel) = args
    tokenizer = _rebuild_tokenizer(vocab_payload)
    return _encode_chunk(tokenizer, texts, max_len, shift, cap, nnz_pad,
                         sentinel)


def _tokenizer_payload(tokenizer):
    """Pickle-friendly description of the tokenizer for worker procs."""
    if hasattr(tokenizer, "vocab"):
        return ("wordpiece", dict(tokenizer.vocab))
    return ("pickle", tokenizer)


def _rebuild_tokenizer(payload):
    kind, data = payload
    if kind == "wordpiece":
        try:
            from ..tokenization.native import NativeWordPieceTokenizer
            return NativeWordPieceTokenizer(data)
        except Exception:
            from ..tokenization.wordpiece import WordPieceTokenizer
            return WordPieceTokenizer(data)
    return data


def save_bot_host(path: str, cols: np.ndarray, nnz: np.ndarray,
                  num_cols: int):
    """Persist BoT ELL rows straight from host arrays (no device hop).

    ``.ell.npz`` -> native layout; anything else -> reference-compatible
    scipy CSR fp16 ``.npz``.
    """
    if path.endswith(".ell.npz"):
        np.savez_compressed(
            path, cols=cols, nnz=nnz, num_cols=np.asarray(num_cols),
            sentinel_padded=np.asarray(True))
        return
    from scipy.sparse import csr_matrix, save_npz

    from ..ops.ell import ELLMatrix

    # host-leaf ELLMatrix so the keep-mask/repeat conversion lives in
    # ONE place (ELLMatrix.to_scipy_csr) instead of three
    ell = ELLMatrix(cols=cols, nnz=nnz, vals=None, num_cols=num_cols,
                    sentinel_padded=True)
    csr = ell.to_scipy_csr().tocsr()
    csr16 = csr_matrix(
        (csr.data.astype(np.float16), csr.indices, csr.indptr),
        shape=csr.shape)
    save_npz(path, csr16)


def build_bot_ell(tokenizer, texts: Sequence[str], max_len: int = 128,
                  shift: int = 999, batch_size: int = 1024,
                  max_token: Optional[int] = None,
                  num_workers: Optional[int] = None,
                  vocab_size: Optional[int] = None,
                  return_host: bool = False,
                  device: bool = True):
    """Build a binary bag-of-token ELLMatrix from raw texts.

    Each row holds the first-``max_token`` unique token ids >= ``shift``
    (shift removes specials/unused vocab slots, reference
    retriever.py:244-246), shifted into [0, V - shift) column space.
    """
    import jax.numpy as jnp

    from ..ops.ell import ELLMatrix

    vocab_size = vocab_size or tokenizer.vocab_size
    if shift >= vocab_size:
        # e.g. a tiny test vocab with the default BERT shift=999 would
        # yield a negative column space and fail deep inside scipy
        raise ValueError(
            f"shift={shift} >= vocab_size={vocab_size}: the token-id "
            "shift must leave a non-empty column space (pass a smaller "
            "--num_shift for non-BERT vocabularies)")
    cap = max_token or max_len
    nnz_pad = max(_round_up(cap, 128), 128)
    n = len(texts)
    sentinel = vocab_size - shift  # mask-free scoring padding

    if num_workers is None:
        num_workers = min(os.cpu_count() or 1, 8)

    if num_workers <= 1 or n < 4 * batch_size:
        cols, nnz = _encode_chunk(tokenizer, texts, max_len, shift, cap,
                                  nnz_pad, sentinel)
    else:
        from multiprocessing import get_context

        payload = _tokenizer_payload(tokenizer)
        chunk = _round_up(-(-n // num_workers), batch_size)
        jobs = [(payload, texts[s: s + chunk], max_len, shift, cap,
                 nnz_pad, sentinel) for s in range(0, n, chunk)]
        with get_context("fork").Pool(num_workers) as pool:
            parts = pool.map(_worker, jobs)
        cols = np.concatenate([p[0] for p in parts])
        nnz = np.concatenate([p[1] for p in parts])

    if device:
        ell = ELLMatrix(cols=jnp.asarray(cols), nnz=jnp.asarray(nnz),
                        vals=None, num_cols=vocab_size - shift,
                        sentinel_padded=True)
    else:
        # host-only ELL (numpy leaves): for build+save pipelines that
        # never search on this process
        ell = ELLMatrix(cols=cols, nnz=nnz, vals=None,
                        num_cols=vocab_size - shift, sentinel_padded=True)
    if return_host:
        return ell, cols, nnz
    return ell
