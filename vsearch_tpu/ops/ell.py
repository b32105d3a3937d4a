"""Static-shape sparse row matrix (ELL format) — the TPU-native CSR.

The reference stores sparse passage matrices as scipy/torch CSR with a
variable number of nonzeros per row (reference: src/ir/retriever/index.py:
144-179). CSR's ragged rows are hostile to XLA's static-shape compilation
model, so on TPU we use a padded ELL layout instead:

  cols : [N, nnz_pad] int32   column indices, row-padded with 0
  vals : [N, nnz_pad] dtype   values, padded with 0  (optional: binary
                              matrices store no values; weight == 1.0)
  nnz  : [N]          int32   true nonzero count per row

Rows are padded to a fixed ``nnz_pad`` (rounded to a multiple of 128 for
lane alignment). Scoring a dense query batch against an ELL matrix is a
gather-reduce:  scores[b, n] = sum_j vals[n, j] * q[b, cols[n, j]]
which is HBM-bandwidth-bound and reads only ``N * nnz_pad`` entries instead
of the dense ``N * V`` — this is what makes 21M-passage vocab-space indexes
fit and fly on TPU.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ELLMatrix:
    """Padded sparse-row matrix. A pytree: jit/pjit/shard-friendly."""

    cols: jax.Array  # [N, nnz_pad] int32
    nnz: jax.Array  # [N] int32
    vals: Optional[jax.Array]  # [N, nnz_pad] or None for binary
    num_cols: int  # static: the dense column dimension V

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.cols, self.nnz, self.vals), (self.num_cols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        cols, nnz, vals = children
        return cls(cols=cols, nnz=nnz, vals=vals, num_cols=aux[0])

    # -- properties --------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, int]:
        return (self.cols.shape[0], self.num_cols)

    @property
    def nnz_pad(self) -> int:
        return self.cols.shape[1]

    @property
    def is_binary(self) -> bool:
        return self.vals is None

    def __len__(self) -> int:
        return self.cols.shape[0]

    # -- conversion --------------------------------------------------------
    @classmethod
    def from_dense(cls, dense, nnz_pad: Optional[int] = None,
                   val_dtype=None) -> "ELLMatrix":
        """Build from a dense [N, V] array (host-side, numpy)."""
        dense = np.asarray(dense)
        n, v = dense.shape
        counts = (dense != 0).sum(axis=1).astype(np.int32)
        max_nnz = int(counts.max()) if n else 0
        if nnz_pad is None:
            nnz_pad = max(_round_up(max_nnz, 128), 128)
        if max_nnz > nnz_pad:
            raise ValueError(f"row nnz {max_nnz} exceeds nnz_pad {nnz_pad}")
        cols = np.zeros((n, nnz_pad), dtype=np.int32)
        val_dtype = val_dtype or dense.dtype
        vals = np.zeros((n, nnz_pad), dtype=val_dtype)
        rows_nz, cols_nz = np.nonzero(dense)
        # position of each nnz within its row (rows_nz is row-major sorted)
        starts = np.zeros(n, dtype=np.int64)
        if n > 1:
            starts[1:] = np.cumsum(counts[:-1], dtype=np.int64)
        offs = np.arange(rows_nz.size, dtype=np.int64) - starts[rows_nz]
        cols[rows_nz, offs] = cols_nz
        vals[rows_nz, offs] = dense[rows_nz, cols_nz]
        return cls(cols=jnp.asarray(cols), nnz=jnp.asarray(counts),
                   vals=jnp.asarray(vals), num_cols=v)

    @classmethod
    def from_scipy_csr(cls, mat, nnz_pad: Optional[int] = None,
                       val_dtype=np.float32, binary: bool = False,
                       pad_multiple: int = 128) -> "ELLMatrix":
        """Build from a scipy CSR matrix/array (host-side).

        Vectorized: no per-row python loop — safe for multi-million-row
        corpora.
        """
        indptr = np.asarray(mat.indptr, dtype=np.int64)
        indices = np.asarray(mat.indices, dtype=np.int32)
        data = np.asarray(mat.data)
        n, v = mat.shape
        counts = np.diff(indptr).astype(np.int32)
        max_nnz = int(counts.max()) if n else 0
        if nnz_pad is None:
            nnz_pad = max(_round_up(max_nnz, pad_multiple), pad_multiple)
        if max_nnz > nnz_pad:
            raise ValueError(f"row nnz {max_nnz} exceeds nnz_pad {nnz_pad}")
        cols = np.zeros((n, nnz_pad), dtype=np.int32)
        # position of each nnz within its row: k - indptr[row]
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        offs = np.arange(indices.size, dtype=np.int64) - np.repeat(
            indptr[:-1], counts)
        cols[rows, offs] = indices
        if binary:
            vals = None
        else:
            vals_np = np.zeros((n, nnz_pad), dtype=val_dtype)
            vals_np[rows, offs] = data.astype(val_dtype)
            vals = jnp.asarray(vals_np)
        return cls(cols=jnp.asarray(cols), nnz=jnp.asarray(counts),
                   vals=vals, num_cols=v)

    def to_scipy_csr(self, dtype=np.float32):
        """Convert back to scipy CSR (host-side) for npz interop."""
        from scipy.sparse import csr_matrix

        cols = np.asarray(self.cols)
        nnz = np.asarray(self.nnz)
        n, nnz_pad = cols.shape
        keep = np.arange(nnz_pad)[None, :] < nnz[:, None]
        rows = np.repeat(np.arange(n), nnz)
        flat_cols = cols[keep]
        if self.vals is None:
            flat_vals = np.ones(flat_cols.size, dtype=dtype)
        else:
            flat_vals = np.asarray(self.vals)[keep].astype(dtype)
        return csr_matrix((flat_vals, (rows, flat_cols)),
                          shape=(n, self.num_cols))

    def to_dense(self, dtype=jnp.float32) -> jax.Array:
        """Densify (small matrices / tests only)."""
        n, nnz_pad = self.cols.shape
        valid = jnp.arange(nnz_pad)[None, :] < self.nnz[:, None]
        if self.vals is None:
            vals = valid.astype(dtype)
        else:
            vals = jnp.where(valid, self.vals, 0).astype(dtype)
        out = jnp.zeros((n, self.num_cols), dtype=dtype)
        # scatter-add so duplicate (padding) col 0 entries with val 0 are
        # harmless
        return out.at[jnp.arange(n)[:, None], self.cols].add(vals)

    def slice_rows(self, start: int, size: int) -> "ELLMatrix":
        return ELLMatrix(
            cols=jax.lax.dynamic_slice_in_dim(self.cols, start, size, 0),
            nnz=jax.lax.dynamic_slice_in_dim(self.nnz, start, size, 0),
            vals=None if self.vals is None
            else jax.lax.dynamic_slice_in_dim(self.vals, start, size, 0),
            num_cols=self.num_cols,
        )


def ell_row_block_scores(q: jax.Array, cols: jax.Array, nnz: jax.Array,
                         vals: Optional[jax.Array]) -> jax.Array:
    """Score a dense query batch against one block of ELL rows.

    q: [B, V] dense queries; cols/nnz/vals: one ELL row block [C, nnz_pad].
    Returns [B, C] scores. Pure jnp — used as the XLA (non-Pallas) path and
    as the reference for kernel tests.
    """
    nnz_pad = cols.shape[1]
    valid = jnp.arange(nnz_pad)[None, :] < nnz[:, None]  # [C, nnz_pad]
    if vals is None:
        w = valid.astype(q.dtype)
    else:
        w = jnp.where(valid, vals, 0).astype(q.dtype)
    # gather: [B, C, nnz_pad]
    g = jnp.take(q, cols, axis=1)
    return jnp.einsum("bcj,cj->bc", g, w)


def ell_matvec_scores(q: jax.Array, mat: ELLMatrix,
                      block_rows: int = 1024) -> jax.Array:
    """scores = q @ mat.T for dense q [B, V] against sparse mat [N, V].

    Blocks over rows to bound the [B, block, nnz_pad] gather intermediate.
    This is the XLA path; `vsearch_tpu.ops.pallas_ell` provides the fused
    TPU kernel. Counterpart of the reference's torch sparse-CSR matmul
    (reference: src/ir/retriever/index.py:88-94).
    """
    n = mat.shape[0]
    n_pad = _round_up(max(n, 1), block_rows)
    pad = n_pad - n

    cols = jnp.pad(mat.cols, ((0, pad), (0, 0)))
    nnz = jnp.pad(mat.nnz, (0, pad))
    vals = None if mat.vals is None else jnp.pad(mat.vals, ((0, pad), (0, 0)))

    nb = n_pad // block_rows
    cols_b = cols.reshape(nb, block_rows, -1)
    nnz_b = nnz.reshape(nb, block_rows)
    if vals is None:
        def body(c_n):
            c, z = c_n
            return ell_row_block_scores(q, c, z, None)
        scores = jax.lax.map(body, (cols_b, nnz_b))
    else:
        vals_b = vals.reshape(nb, block_rows, -1)
        def body(c_n_v):
            c, z, v = c_n_v
            return ell_row_block_scores(q, c, z, v)
        scores = jax.lax.map(body, (cols_b, nnz_b, vals_b))
    # scores: [nb, B, block_rows] -> [B, N]
    scores = jnp.moveaxis(scores, 0, 1).reshape(q.shape[0], n_pad)
    return scores[:, :n]
