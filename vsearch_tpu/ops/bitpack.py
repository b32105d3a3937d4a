"""Bit-packed binary scoring: the Pallas MXU path for bag-of-token search.

The north-star design for SVDR beta search: binary passage rows live
bit-packed in HBM (32x smaller than dense bf16, 4KB per row at V~30k) and
are scored by a fused Pallas kernel that extracts bit planes with VPU
shifts and feeds 128-wide f32 matmuls to the MXU — measured ~160 TFLOP/s
effective on v5e (vs ~0.1 for XLA's scalar-gather sparse path).

Layout (see csrc/bitpack.cc): vocab id ``v`` -> word ``(v//4096)*128 +
v%128``, bit ``(v%4096)//128``. With this tiling the kernel's k-tile /
plane walk visits vocab ids in plain order, so the query operand is just
``q.T`` zero-padded to the packed bit-space — no permutation.

Mosaic notes: concatenated operands break MXU lowering, so the kernel
accumulates 32 small per-plane dots per k-tile instead of one big
concatenated one. Operands are bf16 (probe: 112 TFLOP/s in-kernel vs 26
for f32 on this toolchain; an earlier Mosaic ran bf16 dots off-MXU —
re-probe on toolchain changes). int8 dots fail to compile.
"""
from __future__ import annotations

import ctypes
import dataclasses
import functools
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

TILE_BITS = 4096
LANES = 128
PLANES = 32
ROW_BLOCK = 1024  # rows per kernel program (grid granularity)

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "bitpack.cc")
_LIB = os.path.join(os.path.dirname(__file__), "csrc", "libbitpack.so")
_LOCK = threading.Lock()
_lib_handle = None


def _lib():
    global _lib_handle
    if _lib_handle is None:
        with _LOCK:
            if not (os.path.exists(_LIB) and os.path.getmtime(_LIB)
                    >= os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-std=c++17",
                     "-shared", "-fPIC", "-pthread", _SRC, "-o",
                     _LIB + ".tmp"], check=True, capture_output=True)
                os.replace(_LIB + ".tmp", _LIB)
        lib = ctypes.CDLL(_LIB)
        lib.bitpack_ell.argtypes = [
            np.ctypeslib.ndpointer(np.int32), ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, np.ctypeslib.ndpointer(np.uint32),
            ctypes.c_int32]
        _lib_handle = lib
    return _lib_handle


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BitMatrix:
    """Bit-packed binary matrix [num_rows, num_cols] (rows padded to
    ROW_BLOCK with zero rows; columns padded to a TILE_BITS multiple)."""

    words: jax.Array  # [N_pad, num_words] uint32
    num_rows: int     # true row count
    num_cols: int     # true column count (V')

    def tree_flatten(self):
        return (self.words,), (self.num_rows, self.num_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(words=children[0], num_rows=aux[0], num_cols=aux[1])

    @property
    def padded_bits(self) -> int:
        return self.words.shape[1] * 32

    @property
    def num_ktiles(self) -> int:
        return self.padded_bits // TILE_BITS


def pack_ell_host(cols: np.ndarray, nnz: np.ndarray, num_cols: int
                  ) -> BitMatrix:
    """Pack host ELL arrays into a BitMatrix (C++, threaded)."""
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    nnz = np.ascontiguousarray(nnz, dtype=np.int32)
    n, nnz_pad = cols.shape
    vp = _round_up(num_cols, TILE_BITS)
    num_words = vp // 32
    n_pad = _round_up(max(n, 1), ROW_BLOCK)
    out = np.zeros((n_pad, num_words), dtype=np.uint32)
    nthreads = min(os.cpu_count() or 1, 16)
    _lib().bitpack_ell(cols, nnz.ctypes.data, n, nnz_pad, num_cols,
                       num_words, out, nthreads)
    return BitMatrix(words=jnp.asarray(out), num_rows=n,
                     num_cols=num_cols)


PACK_ROW_BLOCK = 512  # rows per pack-kernel program (lane-major tiles)


def _make_pack_kernel(nnz_pad: int, row_block: int):
    """Pallas pack: one program owns a word tile that stays in VMEM
    while every nonzero is folded in, so each packed word is written to
    HBM exactly once.

    Layout is the whole game on TPU (probe: scripts/probe_pack.py,
    2M x 128 at V=29523, v5e):
      - XLA broadcast-compare fori_loop (shipped previously): 3.30 s
      - rows on sublanes + width-1 LANE slices per nonzero: 21.4 s —
        every iteration pays a cross-lane broadcast relayout
      - this kernel — nonzeros on sublanes, ROWS on lanes, word-ids
        on sublanes: 0.23 s (14x). ``colsT[j:j+1, :]`` is a sublane
        slice and its broadcast against the word-id iota runs on the
        native sublane-broadcast path; per-tile ``acc.T`` lands the
        output directly in row-major [N, num_words] at full speed.

    Invalid slots are pre-masked to word -1, which can never match the
    nonnegative word-id vector.

    The word id and bit value of each nonzero are data-independent per
    slot, so they are hoisted OUT of the kernel into one fused XLA
    elementwise pass over [n, nnz_pad] (see ``_pack_fn``): the unrolled
    inner loop shrinks from ~9 vector ops (2 divmods, mul, add, shift,
    cmp, select, or) to 3 (cmp, select, or). The extra input stream
    (bitv alongside word) costs ~134 MB of HBM reads per 262k-row
    block — sub-ms against the VPU work it removes.
    """
    from jax.experimental import pallas as pl

    def kernel(wordT_ref, bitvT_ref, out_ref):
        t = pl.program_id(1)
        wid = (jax.lax.broadcasted_iota(jnp.int32, (LANES, row_block), 0)
               + t * LANES)
        acc = jnp.zeros((LANES, row_block), jnp.uint32)
        for j in range(nnz_pad):
            w = wordT_ref[j:j + 1, :]  # [1, row_block] sublane slice
            acc = acc | jnp.where(w == wid, bitvT_ref[j:j + 1, :],
                                  jnp.uint32(0))
        out_ref[:] = acc.T

    return kernel


@functools.lru_cache(maxsize=32)
def _pack_fn(n: int, nnz_pad: int, v: int, interpret: bool):
    """Jitted pack program for one (n, nnz_pad, v) shape. Cached: a
    fresh closure per call would retrace AND re-run the ~5 s Mosaic
    compile of the unrolled kernel on every pack (measured in bench as
    pack_steady_s == pack_build_s before the cache)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vp = _round_up(v, TILE_BITS)
    num_words = vp // 32  # multiple of LANES since vp % TILE_BITS == 0
    n_pad = _round_up(max(n, 1), ROW_BLOCK)
    row_block = min(PACK_ROW_BLOCK, n_pad)
    kernel = _make_pack_kernel(nnz_pad, row_block)

    @jax.jit
    def pack(cols, nnz):
        valid = jnp.arange(nnz_pad)[None, :] < nnz[:, None]
        c = jnp.where(valid & (cols >= 0) & (cols < v), cols, -1)
        c = jnp.pad(c, ((0, n_pad - n), (0, 0)), constant_values=-1)
        # hoist the per-slot word/bit arithmetic out of the unrolled
        # kernel (one fused elementwise pass here vs nnz_pad copies of
        # it inside every program); invalid slots keep word -1
        word = jnp.where(c < 0, -1,
                         (c // TILE_BITS) * LANES + (c % LANES))
        bitv = (jnp.uint32(1)
                << ((c % TILE_BITS) // LANES).astype(jnp.uint32))
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_pad, num_words),
                                           jnp.uint32),
            grid=(n_pad // row_block, num_words // LANES),
            in_specs=[pl.BlockSpec((nnz_pad, row_block),
                                   lambda i, t: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((nnz_pad, row_block),
                                   lambda i, t: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((row_block, LANES),
                                   lambda i, t: (i, t),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )
        return f(word.T, bitv.T)

    return pack


def pack_ell_device(ell, interpret: Optional[bool] = None) -> BitMatrix:
    """Pack on-device (no host round trip — device<->host transfers can
    dwarf the pack itself). OR-ing distinct bit values per row is exact
    because column ids are unique within a row."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, nnz_pad = ell.cols.shape
    v = ell.num_cols
    pack = _pack_fn(n, nnz_pad, v, interpret)
    return BitMatrix(words=pack(ell.cols, ell.nnz), num_rows=n,
                     num_cols=v)


def pack_ell(ell, nthreads: Optional[int] = None,
             host_arrays: Optional[Tuple[np.ndarray, np.ndarray]] = None
             ) -> BitMatrix:
    """Pack a binary ELLMatrix into a BitMatrix.

    When the ELL already lives on device, packing runs there (Pallas
    kernel) — uploading a freshly host-packed bit matrix costs ~8x the
    ELL's own bytes in host->device traffic. The C++ host packer is used
    for numpy-resident matrices.
    """
    if isinstance(ell.cols, np.ndarray):
        return pack_ell_host(ell.cols, np.asarray(ell.nnz), ell.num_cols)
    try:
        return pack_ell_device(ell)
    except (jax.errors.JaxRuntimeError, RuntimeError) as exc:
        # OOM / backend failure: fall back to the C++ host packer.
        # Anything else (shape/dtype bugs) must surface, not be masked.
        logger.warning("device bit-pack failed (%s); packing on host",
                       type(exc).__name__)
        if host_arrays is not None:
            return pack_ell_host(host_arrays[0], host_arrays[1],
                                 ell.num_cols)
        return pack_ell_host(np.asarray(ell.cols), np.asarray(ell.nnz),
                             ell.num_cols)


def pack_dense(dense: np.ndarray) -> BitMatrix:
    """Pack a dense 0/1 matrix (tests / small corpora)."""
    from .ell import ELLMatrix

    return pack_ell(ELLMatrix.from_dense(np.asarray(dense)))


def prepare_queries(q: jax.Array, bitmat: BitMatrix) -> jax.Array:
    """q [B, V] -> padded transposed bf16 operand [VP, B]."""
    vp = bitmat.padded_bits
    qT = q.astype(jnp.float32).T  # [V, B]
    qT = jnp.pad(qT, ((0, vp - qT.shape[0]), (0, 0)))
    return qT.astype(jnp.bfloat16)


def _accumulate_scores(bits_ref, q_ref, num_ktiles: int, row_block: int,
                       b: int, num_cols: int):
    """Shared scoring loop: bit-plane extraction (VPU) + per-plane
    [row_block, 128] @ [128, b] dots (MXU), f32 accumulation.

    Operands are bf16: queries are stored bf16 already, and 0/1 plane
    values are exact in bf16, so the f32-accumulated result matches the
    f32-operand variant while running ~4x faster on this Mosaic (probe:
    112 vs 26 TFLOP/s in-kernel). Planes whose 128-lane vocab window
    lies entirely in the zero padding beyond ``num_cols`` are skipped —
    both operands are all-zero there (~10% of the work at V=29523).
    """
    acc = jnp.zeros((row_block, b), jnp.float32)
    for kt in range(num_ktiles):
        words = bits_ref[:, kt * LANES:(kt + 1) * LANES]
        for p in range(PLANES):
            lo = kt * TILE_BITS + p * LANES
            if lo >= num_cols:
                continue
            plane = ((words >> np.uint32(p)) & np.uint32(1)
                     ).astype(jnp.int32).astype(jnp.bfloat16)
            qblk = q_ref[lo: lo + LANES, :]
            acc = acc + jnp.dot(plane, qblk,
                                preferred_element_type=jnp.float32)
    return acc


def _make_kernel(num_ktiles: int, row_block: int, b: int, num_cols: int):
    def kernel(bits_ref, q_ref, o_ref):
        o_ref[:] = _accumulate_scores(bits_ref, q_ref, num_ktiles,
                                      row_block, b, num_cols)

    return kernel


def bitpack_scores(q: jax.Array, bitmat: BitMatrix,
                   row_block: int = ROW_BLOCK,
                   interpret: Optional[bool] = None) -> jax.Array:
    """scores [B, num_rows] = q @ bits.T via the fused Pallas kernel.

    ``interpret`` defaults to True off-TPU (tests on CPU).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_pad, w = bitmat.words.shape
    if n_pad % row_block:
        # the grid floor-divides: a non-dividing row_block would
        # silently leave the tail rows unscored (garbage in output)
        raise ValueError(
            f"row_block {row_block} does not divide padded rows "
            f"{n_pad} (pack pads to ROW_BLOCK={ROW_BLOCK})")
    b = q.shape[0]
    vp = bitmat.padded_bits
    qT = prepare_queries(q, bitmat)
    kernel = _make_kernel(bitmat.num_ktiles, row_block, b,
                          bitmat.num_cols)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, b), jnp.float32),
        grid=(n_pad // row_block,),
        in_specs=[
            pl.BlockSpec((row_block, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vp, b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, b), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    scores = f(bitmat.words, qT)  # [N_pad, B]
    return scores[: bitmat.num_rows].T


BUCKET = 8  # rows folded into one candidate key by the fused kernel


def _make_bucketed_kernel(num_ktiles: int, row_block: int, b: int,
                          num_cols: int, num_rows: int, bucket: int):
    """Fused scoring + bucketed candidate selection.

    Instead of writing the full [row_block, b] score tile to HBM (the
    selection + writeback cost that dominates exact search at millions
    of rows — reference hot path src/ir/retriever/index.py:88-94), each
    program folds ``bucket`` strided rows into one int32 *key* per
    bucket: the score's f32 bits (nonnegative, so integer order == float
    order) with the low ``log2(row_block)`` mantissa bits replaced by
    the local row id. Only row_block/bucket keys per program reach HBM —
    an ``bucket``-fold cut in candidate traffic and final top-k work.
    Score quantization from the id splice is <= 2^-13 relative; a true
    top-k member is lost only when >1 of them land in the same strided
    bucket (rows r, r' collide iff r = r' mod row_block/bucket within a
    block) — measured recall vs exact is ~0.9998 at k=100, N=2M.
    """
    from jax.experimental import pallas as pl

    idx_mask = row_block - 1
    kb = row_block // bucket

    def kernel(bits_ref, q_ref, keys_ref):
        acc = _accumulate_scores(bits_ref, q_ref, num_ktiles, row_block,
                                 b, num_cols)
        acc = jnp.maximum(acc, 0.0)
        keys = jax.lax.bitcast_convert_type(acc, jnp.int32)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (row_block, b), 0)
        keys = (keys & jnp.int32(~idx_mask)) | row_ids
        gid = pl.program_id(0) * row_block + row_ids
        keys = jnp.where(gid < num_rows, keys, jnp.int32(-(2 ** 31)))
        size = row_block
        while size > kb:
            half = size // 2
            keys = jnp.maximum(keys[:half], keys[half:size])
            size = half
        keys_ref[:] = keys

    return kernel


def _bucketed_keys(q: jax.Array, bitmat: BitMatrix, bucket: int,
                   row_block: int, interpret: bool) -> jax.Array:
    """[m, B] int32 candidate keys from the fused score+bucket kernel
    (m = padded_rows / bucket). Shared by bitpack_bucketed_topk and the
    blockwise tier's fused-merge path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, w = bitmat.words.shape
    if n_pad % row_block or row_block & (row_block - 1):
        # grid truncation would skip tail rows; the key splice uses
        # row_block-1 as a bit mask, so row_block must be a power of 2
        raise ValueError(
            f"row_block {row_block} must be a power of two dividing "
            f"padded rows {n_pad} (pack pads to ROW_BLOCK={ROW_BLOCK})")
    b = q.shape[0]
    vp = bitmat.padded_bits
    kb = row_block // bucket
    m = n_pad // bucket  # total candidate keys per query
    qT = prepare_queries(q, bitmat)
    kernel = _make_bucketed_kernel(bitmat.num_ktiles, row_block, b,
                                   bitmat.num_cols, bitmat.num_rows,
                                   bucket)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, b), jnp.int32),
        grid=(n_pad // row_block,),
        in_specs=[
            pl.BlockSpec((row_block, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vp, b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb, b), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return f(bitmat.words, qT)


INT8_KEY_SHIFT = 10  # low bits of the int8 key hold the local row id


def prepare_queries_int8(q: jax.Array, padded_bits: int) -> jax.Array:
    """q [B, V] f32 nonneg -> [VP, B] int8, per-query scale to 127.

    Ranking within a query is scale-invariant, so per-query scaling
    costs nothing in selection quality beyond rounding (<= 1/254 of the
    query's max weight per matched term)."""
    mx = jnp.maximum(jnp.max(q, axis=1, keepdims=True), 1e-6)
    q8 = jnp.round(q.astype(jnp.float32) * (127.0 / mx)
                   ).astype(jnp.int8)
    q8T = q8.T
    return jnp.pad(q8T, ((0, padded_bits - q8T.shape[0]), (0, 0)))


def _make_int8_bucketed_kernel(num_ktiles: int, row_block: int, b: int,
                               num_cols: int, num_rows: int,
                               bucket: int):
    """Int8-MXU variant of the fused bucketed kernel (selection only).

    v5e's int8 MXU peak is ~2x bf16 (probe: docs/probe_int8_scorer.json)
    and 0/1 plane values are exact in int8, so candidate selection runs
    the dots at int8 x int8 -> int32. Scores are integers (quantized
    query weights summed over matched tokens, <= nnz*127 < 2^20), so the
    key is simply ``score << INT8_KEY_SHIFT | local_row_id`` — no f32
    bitcast trick needed. Invalid rows carry INT32_MIN, which any valid
    key (>= 0) beats. Final ranking exactness is restored downstream by
    an exact rerank over the candidate rows."""
    from jax.experimental import pallas as pl

    idx_mask = row_block - 1
    kb = row_block // bucket

    def kernel(bits_ref, q_ref, keys_ref):
        acc = jnp.zeros((row_block, b), jnp.int32)
        for kt in range(num_ktiles):
            words = bits_ref[:, kt * LANES:(kt + 1) * LANES]
            for p in range(PLANES):
                lo = kt * TILE_BITS + p * LANES
                if lo >= num_cols:
                    continue
                plane = ((words >> np.uint32(p)) & np.uint32(1)
                         ).astype(jnp.int8)
                qblk = q_ref[lo: lo + LANES, :]
                acc = acc + jnp.dot(plane, qblk,
                                    preferred_element_type=jnp.int32)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (row_block, b), 0)
        keys = (acc << INT8_KEY_SHIFT) | row_ids
        gid = pl.program_id(0) * row_block + row_ids
        keys = jnp.where(gid < num_rows, keys, jnp.int32(-(2 ** 31)))
        size = row_block
        while size > kb:
            half = size // 2
            keys = jnp.maximum(keys[:half], keys[half:size])
            size = half
        keys_ref[:] = keys

    return kernel


def _int8_bucketed_keys(q8T: jax.Array, bitmat: BitMatrix, bucket: int,
                        row_block: int, interpret: bool) -> jax.Array:
    """[m, B] int32 candidate keys from the int8 fused kernel
    (m = padded_rows / bucket). ``q8T`` is a prepare_queries_int8
    operand — quantize ONCE per batch, not per block."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, w = bitmat.words.shape
    if n_pad % row_block or row_block & (row_block - 1):
        raise ValueError(
            f"row_block {row_block} must be a power of two dividing "
            f"padded rows {n_pad} (pack pads to ROW_BLOCK={ROW_BLOCK})")
    b = q8T.shape[1]
    vp = bitmat.padded_bits
    kb = row_block // bucket
    m = n_pad // bucket
    kernel = _make_int8_bucketed_kernel(bitmat.num_ktiles, row_block, b,
                                        bitmat.num_cols,
                                        bitmat.num_rows, bucket)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, b), jnp.int32),
        grid=(n_pad // row_block,),
        in_specs=[
            pl.BlockSpec((row_block, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vp, b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb, b), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return f(bitmat.words, q8T)


def bitpack_bucketed_topk(q: jax.Array, bitmat: BitMatrix, k: int,
                          bucket: int = BUCKET,
                          row_block: int = ROW_BLOCK,
                          interpret: Optional[bool] = None,
                          approx_final: bool = False,
                          recall_target: float = 0.97
                          ) -> Tuple[jax.Array, jax.Array]:
    """(ids, scores) [B, k] via the fused bucketed kernel.

    The full [N, B] score matrix never exists in HBM; candidates are
    bucket maxima (N/bucket of them), merged by one small top-k. Exact
    up to (a) <=2^-13 relative score quantization and (b) intra-bucket
    collisions among the true top-k (see _make_bucketed_kernel).
    ``approx_final=True`` additionally uses approx_max_k for the merge.
    """
    if k * bucket > bitmat.num_rows:
        # fewer valid buckets than k is possible (each bucket holds up
        # to ``bucket`` valid rows) -> the merge could emit -inf junk;
        # exact selection is cheap at such small sizes anyway
        return bitpack_topk_search(q, bitmat, k=k, interpret=interpret)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_pad = bitmat.words.shape[0]
    kb = row_block // bucket
    m = n_pad // bucket
    keys = _bucketed_keys(q, bitmat, bucket, row_block, interpret)
    idx_mask = row_block - 1
    local = keys & idx_mask
    scores = jax.lax.bitcast_convert_type(keys & ~idx_mask, jnp.float32)
    scores = jnp.where(keys < 0, -jnp.inf, scores)
    block_id = (jnp.arange(m, dtype=jnp.int32) // kb)[:, None]
    gids = block_id * row_block + local  # [m, b]
    k = min(k, m)
    if approx_final and jax.default_backend() == "tpu":
        s, pos = jax.lax.approx_max_k(scores.T, k,
                                      recall_target=recall_target)
    else:
        s, pos = jax.lax.top_k(scores.T, k)  # [b, k]
    ids = jnp.take_along_axis(gids.T, pos, axis=1)
    return ids, s


def bitpack_blockwise_topk(q: jax.Array, cols: jax.Array,
                           nnz: jax.Array, num_cols: int, k: int,
                           block_rows: int = 1 << 18,
                           selection: str = "bucketed",
                           bucket: int = 2 * BUCKET,
                           interpret: Optional[bool] = None,
                           cand_budget: int = 0
                           ) -> Tuple[jax.Array, jax.Array]:
    """(ids, scores) [B, k] over a DEVICE-RESIDENT compact ELL whose
    packed form would not fit HBM.

    The bit-packed layout is a compute format, not a storage format: at
    wiki21m scale (21,015,324 rows — reference
    test/svdr_wiki21m/build_binary_token_index.sh:13-15) the packed
    matrix is ~86 GB but the compact ELL (uint16 cols, nnz<=128) is
    ~5.4 GB and FITS one chip's HBM. This function scans row blocks:
    each block is re-packed on device by the lane-major Pallas pack
    kernel (~30 ms per 2M rows steady state) and scored by the fused
    MXU kernel, so only ONE block's packed bits (~1 GB) are ever live.
    No host transfer after index load — orders of magnitude faster than
    host-streaming the blocks (index/streamed.py), which remains the
    fallback when even the compact ELL exceeds HBM.

    Exactness: per-block results merge into a running global top-k —
    identical to resident scoring under selection='exact';
    selection='bucketed' applies the fused bucketed kernel per block
    and merges the running best INTO the per-block candidate top-k
    (one lax.top_k over [B, m+k] per block instead of a per-block
    [B, m] top-k plus a separate [B, 2k] merge).

    ``bucket`` is the kernel's row fold (default 16 here vs 8 for the
    resident path): per block only the block's OWN top-k competes, so
    a true hit is lost only when a same-bucket row scores between it
    and the global k-th — measured recall stays 1.0 at 21M/k=100 while
    selection cost halves (probe: scripts/probe_block_parts.py).

    selection='bucketed_int8' runs candidate SELECTION on the int8 MXU
    (~2x the bf16 rate on v5e — the bf16 scorer is already at the bf16
    roofline, docs/probe_scorer_variants.json) carrying a
    ``cand_budget`` margin (default 2k) of candidates, then restores
    f32-exact scores and ordering with one exact rerank over the
    survivors. Quantization: per-query scale to int8 127 — rank-
    invariant per query up to rounding; measured candidate recall at
    block shapes is 1.0 for cand >= 2k (docs/probe_int8_scorer.json).
    """
    if selection not in ("exact", "bucketed", "bucketed_int8"):
        raise ValueError(f"unknown selection {selection!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, nnz_pad = cols.shape
    if n == 0:
        raise ValueError("empty index")
    block_rows = min(_round_up(block_rows, ROW_BLOCK),
                     _round_up(n, ROW_BLOCK))
    n_full = n // block_rows
    tail = n - n_full * block_rows
    k = min(k, n)
    b = q.shape[0]
    pack = _pack_fn(block_rows, nnz_pad, num_cols, interpret)
    q = q.astype(jnp.float32)

    int8 = selection == "bucketed_int8"
    # int8 candidate carry: selection scores are int8-quantized, so we
    # carry a cand-sized margin and restore exact order by an exact
    # rerank over the survivors (measured: cand=2k keeps recall 1.0 at
    # 21M/k=100 — docs/probe_int8_scorer.json candidate-recall rows)
    cand = min(max(cand_budget or 2 * k, k), n) if int8 else k
    if int8 and cand * bucket > n:
        # the bucket fold leaves fewer than cand candidates in total —
        # a size where exact blockwise selection is cheap anyway
        int8, selection, cand = False, "exact", k
    if int8 and nnz_pad * 127 >= (1 << (31 - INT8_KEY_SHIFT)):
        # int8 score keys carry score << 10 in an int32: safe for any
        # realistic BoT row (nnz_pad <= 512 -> max score 65,024 << 2^21)
        # but a pathological nnz_pad >= 16513 could overflow the splice
        int8, selection, cand = False, "bucketed", k
    q8T = None
    if int8:
        vp = _round_up(num_cols, TILE_BITS)
        q8T = prepare_queries_int8(q, vp)

    idx_mask = ROW_BLOCK - 1
    kb = ROW_BLOCK // bucket

    def step(best_s, best_i, cols_blk, nnz_blk, true_rows: int, row0):
        """Score one packed block and merge it into the running best.

        Bucketed blocks fuse the merge: candidate keys decode to
        scores, the carried best is appended, and ONE top_k over
        [B, m+k] selects; winners decode their global row id from the
        key's id-splice bits (in-block) or gather it from the carried
        ids (pos >= m)."""
        bm = BitMatrix(words=pack(cols_blk.astype(jnp.int32), nnz_blk),
                       num_rows=true_rows, num_cols=num_cols)
        kloc = min(k, true_rows)
        if int8:
            # int8 selection scores are integers (exact in f32 below
            # 2^20), comparable across blocks because the per-query
            # quantization scale is fixed for the whole sweep. Invalid
            # keys decode to -2^21 < 0 <= any real score, so no -inf
            # masking is needed.
            keys = _int8_bucketed_keys(q8T, bm, bucket, ROW_BLOCK,
                                       interpret)
            m = keys.shape[0]
            keysT = keys.T  # [b, m]
            scores = jnp.where(
                keysT < 0, -jnp.inf,
                (keysT >> INT8_KEY_SHIFT).astype(jnp.float32))
            cat_s = jnp.concatenate([scores, best_s], axis=1)
            s2, pos = jax.lax.top_k(cat_s, cand)
            in_blk = pos < m
            pos_blk = jnp.minimum(pos, m - 1)
            sel_keys = jnp.take_along_axis(keysT, pos_blk, axis=1)
            gid = ((pos_blk // kb) * ROW_BLOCK + (sel_keys & idx_mask)
                   + row0)
            carried = jnp.take_along_axis(
                best_i, jnp.maximum(pos - m, 0), axis=1)
            return s2, jnp.where(in_blk, gid, carried)
        if selection == "bucketed" and kloc * bucket <= true_rows:
            keys = _bucketed_keys(q, bm, bucket, ROW_BLOCK, interpret)
            m = keys.shape[0]
            keysT = keys.T  # [b, m]
            scores = jax.lax.bitcast_convert_type(
                keysT & ~idx_mask, jnp.float32)
            scores = jnp.where(keysT < 0, -jnp.inf, scores)
            cat_s = jnp.concatenate([scores, best_s], axis=1)
            s2, pos = jax.lax.top_k(cat_s, k)
            in_blk = pos < m
            pos_blk = jnp.minimum(pos, m - 1)
            sel_keys = jnp.take_along_axis(keysT, pos_blk, axis=1)
            gid = ((pos_blk // kb) * ROW_BLOCK + (sel_keys & idx_mask)
                   + row0)
            carried = jnp.take_along_axis(
                best_i, jnp.maximum(pos - m, 0), axis=1)
            return s2, jnp.where(in_blk, gid, carried)
        ids, s = bitpack_topk_search(q, bm, k=kloc, interpret=interpret)
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate([best_i, ids + row0], axis=1)
        s2, sel = jax.lax.top_k(cat_s, k)
        return s2, jnp.take_along_axis(cat_i, sel, axis=1)

    best_s = jnp.full((b, cand), -jnp.inf, jnp.float32)
    best_i = jnp.zeros((b, cand), jnp.int32)

    if n_full:
        def body(carry, i):
            bs, bi = carry
            cblk = jax.lax.dynamic_slice(
                cols, (i * block_rows, 0), (block_rows, nnz_pad))
            nblk = jax.lax.dynamic_slice(nnz, (i * block_rows,),
                                         (block_rows,))
            return step(bs, bi, cblk, nblk, block_rows,
                        i * block_rows), None

        (best_s, best_i), _ = jax.lax.scan(
            body, (best_s, best_i),
            jnp.arange(n_full, dtype=jnp.int32))
    if tail:
        # the tail reuses the full-block pack shape: pad rows carry
        # nnz 0 and pack to all-zero bits; the scorers mask rows past
        # num_rows=tail out of selection
        cols_t = jnp.pad(cols[n_full * block_rows:],
                         ((0, block_rows - tail), (0, 0)))
        nnz_t = jnp.pad(nnz[n_full * block_rows:],
                        ((0, block_rows - tail),))
        best_s, best_i = step(best_s, best_i, cols_t, nnz_t, tail,
                              n_full * block_rows)
    if int8:
        # exact rerank of the cand survivors: one small gather restores
        # f32-exact scores and ordering, so the int8 quantization only
        # ever perturbs WHICH cand candidates survive, never the final
        # ranking among them. ELL vals=None (binary BoT) and the nnz
        # mask keeps the rerank correct for non-sentinel padding too.
        from .ell import ELLMatrix
        from .two_stage import exact_rerank

        ell = ELLMatrix(cols=cols, nnz=nnz, vals=None,
                        num_cols=num_cols, sentinel_padded=False)
        return exact_rerank(q, ell, best_i, k)
    return best_i, best_s


def bitpack_topk_search(q: jax.Array, bitmat: BitMatrix, k: int,
                        interpret: Optional[bool] = None,
                        approx: bool = False,
                        recall_target: float = 0.97
                        ) -> Tuple[jax.Array, jax.Array]:
    """(ids, scores) [B, k] — kernel scoring + top-k, one XLA program.

    ``approx=True`` swaps exact top-k for TPU-native ``approx_max_k``
    (~2x faster selection at the given recall target)."""
    scores = bitpack_scores(q, bitmat, interpret=interpret)
    if approx and jax.default_backend() == "tpu":
        s, i = jax.lax.approx_max_k(scores, k,
                                    recall_target=recall_target)
    else:
        s, i = jax.lax.top_k(scores, k)
    return i, s
