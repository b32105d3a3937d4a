"""Mesh-sharded index search: per-shard top-k merged over ICI.

The reference loads all index shards onto ONE device via glob+vstack
(reference: src/ir/retriever/index.py:163-179) — its "index-serve
sharding" stops at the filesystem. Here the index rows shard across the
mesh's ``dp`` axis; each device scores its rows and produces a local
top-k, and only (ids, scores) candidate lists — O(devices * k), not
score rows — ride the interconnect through an all_gather before the
final merge. This is what lets a wiki21m-scale index live across a v5e
slice with single-digit-ms query latency.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ell import ELLMatrix
from ..ops.search import dense_topk_search, merge_shard_topk


def _pad_rows(n: int, shards: int) -> int:
    per = -(-n // shards)
    return per * shards


def _pad_leading(arr, pad_widths, constant_values=0):
    """Pad keeping host arrays on the host: jnp.pad on a numpy input
    would materialize the FULL padded array on the default device
    before device_put shards it — at wiki21m scale that OOMs device 0
    for an index that fits fine at 1/shards per device."""
    if isinstance(arr, np.ndarray):
        return np.pad(arr, pad_widths, constant_values=constant_values)
    return jnp.pad(arr, pad_widths, constant_values=constant_values)


def _demote_padding(ids: jax.Array, scores: jax.Array, num_rows: int
                    ) -> jax.Array:
    """Mask scores of padding rows (id >= num_rows) to -inf BEFORE the
    cross-shard merge, so pad candidates never displace real rows from
    the merged top-k. Padding rows are all-zero and score exactly 0,
    which BEATS real rows whenever real scores are negative (routine
    for dense DPR embeddings) — so masking by score sign is wrong; mask
    by id range (reference semantics: only real rows exist,
    src/ir/retriever/index.py:88-94)."""
    return jnp.where(ids < num_rows, scores, -jnp.inf)


def shard_rows(mesh: Mesh, arr: jax.Array, axis_name: str = "dp"
               ) -> jax.Array:
    """Pad leading dim to the shard count and place row-sharded."""
    shards = mesh.shape[axis_name]
    n = arr.shape[0]
    pad = _pad_rows(n, shards) - n
    if pad:
        arr = _pad_leading(arr, [(0, pad)] + [(0, 0)] * (arr.ndim - 1))
    spec = P(axis_name, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def shard_ell(mesh: Mesh, ell: ELLMatrix, axis_name: str = "dp"
              ) -> ELLMatrix:
    """Row-shard an ELLMatrix over the mesh (padding rows are empty:
    sentinel cols, nnz 0)."""
    shards = mesh.shape[axis_name]
    n = ell.cols.shape[0]
    pad = _pad_rows(n, shards) - n
    cols, nnz, vals = ell.cols, ell.nnz, ell.vals
    if pad:
        pad_col = ell.num_cols if ell.sentinel_padded else 0
        cols = _pad_leading(cols, ((0, pad), (0, 0)),
                            constant_values=pad_col)
        nnz = _pad_leading(nnz, ((0, pad),))
        if vals is not None:
            vals = _pad_leading(vals, ((0, pad), (0, 0)))
    sh2 = NamedSharding(mesh, P(axis_name, None))
    sh1 = NamedSharding(mesh, P(axis_name))
    return ELLMatrix(
        cols=jax.device_put(cols, sh2),
        nnz=jax.device_put(nnz, sh1),
        vals=None if vals is None else jax.device_put(vals, sh2),
        num_cols=ell.num_cols, sentinel_padded=ell.sentinel_padded)


def make_sharded_dense_search(mesh: Mesh, k: int, num_rows: int,
                              axis_name: str = "dp"):
    """Build a jitted sharded dense search: (q [B, D] replicated,
    vectors [N, D] row-sharded) -> global (ids, scores) [B, k].

    ``num_rows`` is the TRUE (unpadded) row count; ids of padding rows
    added by ``shard_rows`` are demoted below every real hit."""
    shards = mesh.shape[axis_name]
    rows_per = _pad_rows(num_rows, shards) // shards
    # widen the local k by the pad count (< shards, all in the tail
    # shard) so pad rows entering a LOCAL top-k can never displace a
    # real global-top-k candidate; they are then -inf'd pre-merge
    pad_total = rows_per * shards - num_rows
    k_local = min(k + pad_total, rows_per)

    def local(q, vec_shard):
        ids, scores = dense_topk_search(
            q, vec_shard, k_local,
            precision=jax.lax.Precision.DEFAULT)
        offset = jax.lax.axis_index(axis_name) * rows_per
        ids = ids + offset
        scores = _demote_padding(ids, scores, num_rows)
        all_ids = jax.lax.all_gather(ids, axis_name)        # [S, B, kl]
        all_scores = jax.lax.all_gather(scores, axis_name)
        return merge_shard_topk(all_ids, all_scores, k)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis_name, None)),
        out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)


def shard_bitmat(mesh: Mesh, bitmat, axis_name: str = "dp"):
    """Row-shard a BitMatrix over the mesh (rows already padded to the
    kernel row-block; pad further to the shard count with zero rows)."""
    from ..ops.bitpack import ROW_BLOCK, BitMatrix

    shards = mesh.shape[axis_name]
    words = bitmat.words
    n_pad = words.shape[0]
    # each shard must hold a whole number of kernel row-blocks
    target = -(-n_pad // (shards * ROW_BLOCK)) * shards * ROW_BLOCK
    if target != n_pad:
        words = _pad_leading(words, ((0, target - n_pad), (0, 0)))
    sh = NamedSharding(mesh, P(axis_name, None))
    return BitMatrix(words=jax.device_put(words, sh),
                     num_rows=bitmat.num_rows, num_cols=bitmat.num_cols)


def make_sharded_bitpack_search(mesh: Mesh, k: int, bitmat,
                                axis_name: str = "dp",
                                interpret=None,
                                selection: str = "bucketed"):
    """Sharded bit-packed binary search: per-shard Pallas MXU scoring +
    local top-k + ICI merge. ``bitmat`` must be sharded via
    ``shard_bitmat``. ``selection``: 'bucketed' runs the fused
    scoring+selection kernel per shard (the [rows_per, B] score tile
    never reaches HBM — measured faster than exact at every probed
    size, recall 1.0); 'exact' scores then lax.top_k."""
    from ..ops.bitpack import (BUCKET, BitMatrix, bitpack_bucketed_topk,
                               bitpack_scores)

    shards = mesh.shape[axis_name]
    n_pad = bitmat.words.shape[0]
    rows_per = n_pad // shards
    if k > bitmat.num_rows:
        raise ValueError(
            f"k={k} exceeds index rows {bitmat.num_rows}; clamp k "
            "before building the sharded search")
    if selection == "bucketed" and k * BUCKET > rows_per:
        # mirror the unsharded guard (ops/bitpack.py): with fewer valid
        # buckets than k per shard the merge emits junk (recall decays
        # well before the hard crash at k > rows_per // BUCKET); exact
        # per-shard selection is cheap at such sizes
        selection = "exact"
    k_local = min(k, rows_per // BUCKET if selection == "bucketed"
                  else rows_per)
    num_cols = bitmat.num_cols

    def local(q, words):
        shard = BitMatrix(words=words, num_rows=rows_per,
                          num_cols=num_cols)
        # padding rows (zero bits) score 0; real scores >= 0 too, so mask
        # out-of-range ids after the merge instead: here offset ids
        if selection == "bucketed":
            i, s = bitpack_bucketed_topk(q, shard, k=k_local,
                                         interpret=interpret)
        else:
            scores = bitpack_scores(q, shard, interpret=interpret)
            s, i = jax.lax.top_k(scores, k_local)
        i = i + jax.lax.axis_index(axis_name) * rows_per
        s = _demote_padding(i, s, bitmat.num_rows)
        all_ids = jax.lax.all_gather(i, axis_name)
        all_scores = jax.lax.all_gather(s, axis_name)
        return merge_shard_topk(all_ids, all_scores, k)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis_name, None)),
        out_specs=(P(), P()), check_vma=False)
    return jax.jit(lambda q, bm: fn(q, bm.words))


def make_sharded_ell_search(mesh: Mesh, k: int,
                            ell_template: ELLMatrix, score_fn,
                            axis_name: str = "dp",
                            num_rows: int | None = None):
    """Build a jitted sharded sparse search over a row-sharded ELLMatrix.

    ``score_fn(q, ell_shard) -> [B, rows_per]`` is the single-device
    scorer (exact chunked gather or the bit-plane MXU scorer);
    ``ell_template`` supplies static metadata (num_cols, has-vals,
    sharded row count — pass the already-sharded matrix).
    ``num_rows`` is the TRUE (pre-``shard_ell``) row count; ids of
    padding rows are demoted below every real hit.
    """
    shards = mesh.shape[axis_name]
    padded_rows = ell_template.cols.shape[0]
    assert padded_rows % shards == 0, "shard the ELL with shard_ell first"
    if num_rows is None:
        num_rows = padded_rows
    rows_per = padded_rows // shards
    # same pad-displacement guard as make_sharded_dense_search
    k_local = min(k + (padded_rows - num_rows), rows_per)
    num_cols = ell_template.num_cols
    has_vals = ell_template.vals is not None
    # carry the template's padding scheme: a sentinel_padded=False ELL
    # pads with col 0, and scorers only apply the nnz validity mask in
    # that mode — rebuilding shards as sentinel_padded=True would make
    # every padding slot gather q[:, 0] and inflate row scores
    sentinel_padded = ell_template.sentinel_padded

    def local(q, cols, nnz, vals):
        ell_shard = ELLMatrix(cols=cols, nnz=nnz, vals=vals,
                              num_cols=num_cols,
                              sentinel_padded=sentinel_padded)
        scores = score_fn(q, ell_shard)  # [B, rows_per]
        s, i = jax.lax.top_k(scores, k_local)
        i = i + jax.lax.axis_index(axis_name) * rows_per
        s = _demote_padding(i, s, num_rows)
        all_ids = jax.lax.all_gather(i, axis_name)   # [S, B, kl]
        all_scores = jax.lax.all_gather(s, axis_name)
        return merge_shard_topk(all_ids, all_scores, k)

    if has_vals:
        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(axis_name, None), P(axis_name),
                      P(axis_name, None)),
            out_specs=(P(), P()), check_vma=False)
        return jax.jit(lambda q, e: fn(q, e.cols, e.nnz, e.vals))
    fn = jax.shard_map(
        lambda q, c, z: local(q, c, z, None), mesh=mesh,
        in_specs=(P(), P(axis_name, None), P(axis_name)),
        out_specs=(P(), P()), check_vma=False)
    return jax.jit(lambda q, e: fn(q, e.cols, e.nnz))


def make_sharded_blockwise_search(mesh: Mesh, k: int, num_rows: int,
                                  ell_template: ELLMatrix,
                                  axis_name: str = "dp",
                                  selection: str = "bucketed",
                                  block_rows: int = 1 << 18,
                                  interpret=None):
    """Sharded >HBM-per-shard BoT search: the BLOCK tier under a mesh.

    Each shard holds its rows as a COMPACT device-resident ELL (the
    bit-packed layout is a compute format, not a storage format — see
    ops/bitpack.bitpack_blockwise_topk) and scores them blockwise:
    on-device repack + fused MXU scoring per row block, running local
    top-k, then the O(shards x k) global merge over ICI. This serves
    corpora whose PACKED form exceeds even per-shard HBM — e.g. a
    v5e-8 holds ~34M rows/chip ELL-resident, ~270M rows per slice,
    where the reference's vstack-on-one-device load
    (src/ir/retriever/index.py:163-179) is bounded by one accelerator.

    ``ell_template`` must already be row-sharded via ``shard_ell``
    (binary: vals=None); ``num_rows`` is the TRUE pre-pad row count.
    """
    if ell_template.vals is not None:
        raise ValueError("blockwise sharded search is binary "
                         "(bag-of-token) only")
    from ..ops.bitpack import bitpack_blockwise_topk

    shards = mesh.shape[axis_name]
    padded_rows = ell_template.cols.shape[0]
    assert padded_rows % shards == 0, "shard the ELL with shard_ell first"
    rows_per = padded_rows // shards
    if k > num_rows:
        raise ValueError(f"k={k} exceeds index rows {num_rows}; clamp "
                         "k before building the sharded search")
    # pad-displacement guard (same as make_sharded_ell_search): widen
    # the local k by the global pad count so demoted pad candidates can
    # never push a real row out of the merged top-k
    k_local = min(k + (padded_rows - num_rows), rows_per)
    num_cols = ell_template.num_cols

    def local(q, cols, nnz):
        ids, s = bitpack_blockwise_topk(
            q, cols, nnz, num_cols=num_cols, k=k_local,
            block_rows=block_rows, selection=selection,
            interpret=interpret)
        ids = ids + jax.lax.axis_index(axis_name) * rows_per
        s = _demote_padding(ids, s, num_rows)
        all_ids = jax.lax.all_gather(ids, axis_name)
        all_scores = jax.lax.all_gather(s, axis_name)
        return merge_shard_topk(all_ids, all_scores, k)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis_name, None), P(axis_name)),
        out_specs=(P(), P()), check_vma=False)
    return jax.jit(lambda q, e: fn(q, e.cols, e.nnz))
