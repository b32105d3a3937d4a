"""Sparse (ELL) and bag-of-token indexes.

TPU-native rebuild of the reference's ``SparseIndex``/``BoTIndex``
(reference: src/ir/retriever/index.py:128-218). The scipy/torch CSR of
the reference becomes a static-shape ELL pytree. Scoring paths:
bit-packed Pallas MXU kernel for binary / bag-of-token indexes at every
size on TPU (``ops.bitpack``; fused bucketed selection above 131k
rows), binary-support proxy + exact gather rerank for large real-valued
indexes, exact chunked gather elsewhere (and off-TPU for small
indexes). On-disk format stays scipy-``.npz``-compatible so
indexes interoperate with the reference, with a faster native
``.ell.npz`` layout alongside.
"""
from __future__ import annotations

import logging
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ell import ELLMatrix
from .base import DenseIndex, IndexType, SearchResults, _resolve_files

logger = logging.getLogger(__name__)


class SparseIndex(DenseIndex):
    """Sparse vocab-space index over an ELLMatrix."""

    index_type = IndexType.SPARSE
    _binary = False

    # two-stage search knobs (see ops/two_stage.py): in 'auto' mode
    # indexes larger than ``exact_threshold`` rows route through the
    # binary-support proxy + exact rerank (bitproxy)
    exact_threshold = 131072
    # max C*nnz_pad scalar gathers PER QUERY for the exact rerank stage.
    # Per-query (not per-call) so a query's results are independent of
    # how many queries share the device call — the serve coalescer
    # merges concurrent requests into one batch, and recall must not
    # depend on concurrent load. 196608/query = C=1536 at nnz_pad 128:
    # measured 0.991 recall vs exact at 521 QPS on the 2M-row probe
    # (docs/probe_alpha_sweep.json) — the smallest budget that clears
    # the >=0.99 parity bar with the reference's exact CSR scoring
    # (reference src/ir/retriever/index.py:88-94). Operators chasing
    # QPS over parity can lower it (C=1024 -> 0.967 recall, 668 QPS).
    rerank_budget = 196_608

    def __init__(self, index_file: Optional[str] = None,
                 data_file: Optional[str] = None, fp16: bool = True,
                 low_memory: bool = False, shift: int = 0,
                 val_dtype=jnp.bfloat16, block_rows: int = 4096,
                 search_mode: str = "auto",
                 selection: Optional[str] = None):
        self.shift = shift
        self.val_dtype = val_dtype
        self.block_rows = block_rows
        if search_mode in ("stream", "block") and not self._binary:
            # the >HBM tiers pack blocks to bits on device —
            # binary-only; a real-valued index would silently lose its
            # weights
            raise ValueError(f"search_mode={search_mode!r} supports "
                             "binary bag-of-token indexes only")
        self.search_mode = search_mode  # 'auto'|'exact'|'bitproxy'
        if selection is not None:  # else the class default applies
            self.selection = selection
        self.ell: Optional[ELLMatrix] = None
        self.bitproxy = None  # support-bits BitMatrix (bitproxy mode)
        super().__init__(index_file, data_file, fp16,
                         low_memory=low_memory)

    # -- loading -----------------------------------------------------------
    def init_index(self, index_file: Union[str, Sequence[str]],
                   fp16: bool = True):
        files = _resolve_files(index_file)
        logger.info("Loading %s index from %d file(s)",
                    self.index_type.value, len(files))
        if all(f.endswith(".ell.npz") for f in files):
            self.ell = self._load_native(files)
        else:
            self.ell = self._load_scipy(files)
        self._reset_derived()
        if isinstance(self.ell.cols, np.ndarray):
            # host-resident load (>HBM streaming path): the host cache
            # doubles as the streamer's backing store
            self._host_cache = (np.asarray(self.ell.cols),
                                np.asarray(self.ell.nnz))

    def _reset_derived(self):
        """Drop every artifact derived from the previous ELL — a reload
        that kept the packed bit matrix (or a sharded-search fn built
        for the old mesh/row count) would silently answer queries
        against the OLD corpus."""
        self.bitproxy = None
        self._search_fn = None
        self.bitmat = None  # no-op on plain SparseIndex, vital on BoT
        self._host_cache = None
        self._mesh = None
        self._true_rows = None
        self._streamer = None  # host-streaming searcher (BoT, >HBM)
        self._block_ell = None  # device compact ELL (BoT block tier)
        self._block_fn = None
        self._mesh_ell = None  # mesh-sharded compact ELL (block tier)

    def _should_host_load(self, n: int, v: int) -> bool:
        """Keep a freshly loaded index host-resident (numpy) instead of
        device-resident? Overridden by BoTIndex for the >HBM streaming
        path; real-valued sparse indexes must fit the device."""
        return False

    def _load_scipy(self, files) -> ELLMatrix:
        from scipy.sparse import csr_matrix, load_npz, vstack

        def load_f32(path):
            m = load_npz(path)
            if m.dtype == np.float16:
                # modern scipy can't operate on f16 matrices (the reference
                # stores f16 npz) — rebuild as f32 via the raw constructor
                m = csr_matrix(
                    (m.data.astype(np.float32), m.indices, m.indptr),
                    shape=m.shape)
            return m

        shards = [load_f32(f) for f in files]
        if self.shift:
            shards = [s[:, self.shift:] for s in shards]
        mat = vstack(shards).tocsr() if len(shards) > 1 else shards[0].tocsr()
        host = self._should_host_load(mat.shape[0], mat.shape[1])
        return ELLMatrix.from_scipy_csr(
            mat, binary=self._binary,
            val_dtype=np.float32 if not self._binary else None,
            device=not host)

    def _load_native(self, files) -> ELLMatrix:
        parts = []
        num_cols = sentinel = has_vals = None
        for f in files:
            with np.load(f) as z:
                cols, nnz = z["cols"], z["nnz"]
                vals = z["vals"] if "vals" in z.files else None
                meta = (int(z["num_cols"]),
                        bool(z["sentinel_padded"])
                        if "sentinel_padded" in z.files else False,
                        vals is not None)
                if num_cols is None:
                    num_cols, sentinel, has_vals = meta
                elif meta != (num_cols, sentinel, has_vals):
                    # shards from different builds would silently
                    # corrupt the merged index (wrong vocab width /
                    # sentinel column / value semantics) — refuse
                    raise ValueError(
                        f"inconsistent index shard {f}: "
                        f"(num_cols, sentinel_padded, has_vals)={meta} "
                        f"vs {(num_cols, sentinel, has_vals)} from "
                        f"{files[0]}")
                parts.append((cols, nnz, vals))
        nnz_pad = max(p[0].shape[1] for p in parts)
        pad_col = num_cols if sentinel else 0
        cols = np.concatenate(
            [np.pad(p[0], ((0, 0), (0, nnz_pad - p[0].shape[1])),
                    constant_values=pad_col) for p in parts])
        nnz = np.concatenate([p[1] for p in parts])
        if parts[0][2] is None:
            vals = None
        else:
            vals = np.concatenate(
                [np.pad(p[2], ((0, 0), (0, nnz_pad - p[2].shape[1])))
                 for p in parts])
        if self._should_host_load(cols.shape[0], num_cols):
            return ELLMatrix(
                cols=cols, nnz=nnz,
                vals=None if vals is None
                else vals.astype(self.val_dtype),
                num_cols=num_cols, sentinel_padded=sentinel)
        return ELLMatrix(
            cols=jnp.asarray(cols), nnz=jnp.asarray(nnz),
            vals=None if vals is None
            else jnp.asarray(vals, dtype=self.val_dtype),
            num_cols=num_cols, sentinel_padded=sentinel)

    def set_ell(self, ell: ELLMatrix):
        self.ell = ell
        self._reset_derived()

    def set_vectors(self, mat):
        """Accept a dense or scipy-sparse matrix and convert to ELL."""
        import scipy.sparse as sp

        if sp.issparse(mat):
            self.ell = ELLMatrix.from_scipy_csr(mat, binary=self._binary)
        else:
            self.ell = ELLMatrix.from_dense(np.asarray(mat),
                                            binary=self._binary)
        self._reset_derived()

    @property
    def vector(self):  # reference-compat accessor
        return self.ell

    @vector.setter
    def vector(self, v):
        if v is None:
            self.ell = None
        elif isinstance(v, ELLMatrix):
            self.set_ell(v)
        else:
            self.set_vectors(v)

    def __len__(self) -> int:
        if self.data is not None:
            return len(self.data)
        if self._lazy is not None:
            return len(self._lazy)
        return 0 if self.ell is None else self.ell.shape[0]

    # -- distribution ------------------------------------------------------
    # (move_to_device shim inherited from DenseIndex)
    def to_mesh(self, mesh, axis_name: str = "dp"):
        """Row-shard the ELL across the mesh; searches switch to the
        per-shard exact scorer + ICI top-k merge."""
        from ..parallel.sharded_search import shard_ell

        self._true_rows = self.ell.shape[0]
        self.ell = shard_ell(mesh, self.ell, axis_name)
        self._mesh = (mesh, axis_name)
        self._search_fn = None
        return self

    # -- search ------------------------------------------------------------
    def _use_bitproxy(self) -> bool:
        if self.search_mode == "bitproxy":
            return True
        if self.search_mode != "auto":
            return False
        return self.ell.shape[0] > self.exact_threshold

    def search(self, q_embs, k: int,
               num_candidates: Optional[int] = None) -> SearchResults:
        from ..ops.two_stage import exact_search

        q = (q_embs.astype(jnp.float32)
             if isinstance(q_embs, jax.Array) else
             jnp.asarray(np.asarray(q_embs), dtype=jnp.float32))
        if q.shape[-1] != self.ell.num_cols:
            raise ValueError(
                f"query dim {q.shape[-1]} != index dim {self.ell.num_cols}")
        n = self.ell.shape[0]
        k = min(k, getattr(self, "_true_rows", None) or n)
        if q.shape[0] == 0:
            # the Pallas scorers reject B=0 with a cryptic Mosaic error;
            # an empty batch has a well-defined empty answer
            return SearchResults(np.zeros((0, k), np.int32),
                                 np.zeros((0, k), np.float32))
        mesh_info = getattr(self, "_mesh", None)
        if mesh_info is not None:
            from ..ops.ell import ell_matvec_chunked
            from ..parallel.sharded_search import make_sharded_ell_search

            mesh, axis_name = mesh_info
            if self._search_fn is None or self._search_fn[0] != ("m", k):
                fn = make_sharded_ell_search(
                    mesh, k=k, ell_template=self.ell,
                    score_fn=lambda qq, shard: ell_matvec_chunked(
                        qq, shard, chunk_rows=self.block_rows * 16),
                    axis_name=axis_name,
                    num_rows=getattr(self, "_true_rows", None))
                self._search_fn = (("m", k), fn)
            ids, scores = self._search_fn[1](q, self.ell)
            return SearchResults(np.asarray(ids), np.asarray(scores))
        if num_candidates is None:
            # candidate count = the PER-QUERY scalar-gather budget
            # (batch-size-independent: same query, same results, any
            # concurrent load). The budget is a true CAP — an operator
            # lowering rerank_budget must actually bound the gather
            # work — floored only at k (k results need k candidates).
            cap = self.rerank_budget // max(self.ell.nnz_pad, 1)
            num_candidates = min(n, max(k, cap))
        else:
            # user-supplied candidate counts get the same clamp: below
            # k the final top_k crashes, above n approx_max_k crashes
            num_candidates = min(n, max(num_candidates, k))
        if self._use_bitproxy():
            from ..ops.two_stage import binary_proxy_search

            if getattr(self, "bitproxy", None) is None:
                from ..ops.bitpack import pack_ell
                self.bitproxy = pack_ell(
                    self.ell, host_arrays=getattr(self, "_host_cache",
                                                  None))
            c = max(num_candidates, k)
            key = ("bp", k, c)
            if self._search_fn is None or self._search_fn[0] != key:
                fn = jax.jit(lambda q, ell, bm: binary_proxy_search(
                    q, ell, bm, k=k, num_candidates=c))
                self._search_fn = (key, fn)
            ids, scores = self._search_fn[1](q, self.ell, self.bitproxy)
        else:
            if self._search_fn is None or self._search_fn[0] != ("e", k):
                fn = jax.jit(lambda q, ell: exact_search(q, ell, k=k))
                self._search_fn = (("e", k), fn)
            ids, scores = self._search_fn[1](q, self.ell)
        return SearchResults(np.asarray(ids), np.asarray(scores))

    # -- persistence -------------------------------------------------------
    def save(self, path: str, native: Optional[bool] = None):
        if native is None:
            native = path.endswith(".ell.npz")
        ell = self.ell
        true_rows = getattr(self, "_true_rows", None)
        if true_rows and ell.shape[0] != true_rows:
            # drop mesh-sharding pad rows before persisting
            ell = ell.slice_rows(0, true_rows)
        if native:
            arrays = dict(
                cols=np.asarray(ell.cols),
                nnz=np.asarray(ell.nnz),
                num_cols=np.asarray(ell.num_cols),
                sentinel_padded=np.asarray(ell.sentinel_padded),
            )
            if ell.vals is not None:
                arrays["vals"] = np.asarray(
                    ell.vals.astype(jnp.float16)
                    if ell.vals.dtype != np.float16 else ell.vals)
            np.savez_compressed(path, **arrays)
        else:
            from scipy.sparse import csr_matrix, save_npz

            csr = ell.to_scipy_csr(dtype=np.float32).tocsr()
            # store f16 on disk (reference-compatible format) via the raw
            # constructor — scipy ops don't support f16 but save/load do
            csr16 = csr_matrix(
                (csr.data.astype(np.float16), csr.indices, csr.indptr),
                shape=csr.shape)
            save_npz(path, csr16)
        logger.info("Index saved to %s", path)

    def __str__(self):
        shape = None if self.ell is None else self.ell.shape
        return (f"Index Type        : {type(self).__name__}\n"
                f"Vector Shape      : {shape}\n"
                f"nnz_pad           : {None if self.ell is None else self.ell.nnz_pad}\n"
                f"Number of Texts   : {len(self)}\n")


class BoTIndex(SparseIndex):
    """Bag-of-token binary index: same ELL storage, no values (implicit
    1.0 weights), semi-parametric search type (reference
    src/ir/retriever/index.py:205-218).

    Large binary indexes score through the bit-packed Pallas MXU kernel
    (ops/bitpack.py): 4KB/row in HBM, exact scores, ~160 TFLOP/s
    effective on v5e — the TPU answer to the reference's CUDA sparse-CSR
    matmul. Indexes whose packed matrix exceeds the HBM budget fall to
    one of two over-size tiers: 'block' keeps the COMPACT ELL
    device-resident (uint16 cols — ~5.4 GB at wiki21m scale vs ~86 GB
    packed) and re-packs row blocks on device inside the search program
    (ops/bitpack.bitpack_blockwise_topk, no host traffic per query);
    'stream' streams host-resident ELL blocks through the device
    (index/streamed.py) when even the compact ELL exceeds HBM.
    search_mode: 'auto' | 'exact' | 'bitpack' | 'block' | 'stream'.
    """

    index_type = IndexType.BAG_OF_TOKEN
    _binary = True

    # -- >HBM tier knobs (ops/bitpack.py + index/streamed.py) ---------------
    # 'auto' leaves the resident bit-packed path when the packed matrix
    # would not fit the device HBM budget: the flagship wiki21m corpus
    # (21M rows) packs to ~86 GB vs 16 GB on one v5e. The budget leaves
    # headroom for queries, per-block transients and encoder weights.
    hbm_budget_bytes: Optional[int] = None  # None -> 12 GiB on TPU
    stream_block_rows = 1 << 18

    # top-k selection policy over bit-packed scores. 'auto' resolves to
    # the fused bucketed kernel (ops/bitpack.bitpack_bucketed_topk):
    # measured faster than exact lax.top_k at EVERY probed size
    # (v5e, B=128, k=100 — 15.8->11.8 ms at 100k rows, 173->99 ms at
    # 2M) with recall 1.0 vs exact at all sizes (see
    # docs/ARCHITECTURE.md regret table), so there is no size threshold
    # anymore. 'approx' = approx_max_k over exact scores (recall
    # ~0.97-1.0); 'bucketed_approx' additionally uses approx_max_k for
    # the candidate merge (fastest; recall depends on
    # approx_recall_target); 'exact' forces full lax.top_k.
    selection = "auto"  # 'auto'|'exact'|'approx'|'bucketed'|'bucketed_approx'
    approx_recall_target = 0.99

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.bitmat = None

    # below this row count 'auto' keeps exact lax.top_k after bitpack
    # scoring: with only N/8 buckets, top-100 bucket collisions become
    # measurable at small N (recall 0.9988 at 20k rows vs 1.0), while
    # exact selection there costs ~25% of an already-tiny search
    bucketed_threshold = 131_072

    def _resolved_selection(self) -> str:
        if self.selection != "auto":
            return self.selection
        return ("bucketed" if self.ell.shape[0] > self.bucketed_threshold
                else "exact")

    def _packed_bytes(self, n: Optional[int] = None,
                      v: Optional[int] = None) -> int:
        """HBM footprint of the bit-packed matrix (4 KB/row at V~30k)."""
        n = self.ell.shape[0] if n is None else n
        v = self.ell.num_cols if v is None else v
        n_pad = -(-n // 1024) * 1024
        vp = -(-v // 4096) * 4096
        return n_pad * (vp // 8)

    def _budget(self) -> int:
        if self.hbm_budget_bytes is not None:
            return self.hbm_budget_bytes
        return 12 << 30

    def _should_host_load(self, n: int, v: int) -> bool:
        if self.search_mode in ("stream", "block"):
            return True
        return (self.search_mode == "auto"
                and jax.default_backend() == "tpu"
                and self._packed_bytes(n, v) > self._budget())

    def _ell_device_bytes(self) -> int:
        """Device footprint of the compact ELL as the block tier stores
        it (uint16 cols when the vocab allows, int32 nnz)."""
        n, nnz_pad = self.ell.cols.shape
        itemsize = 2 if self.ell.num_cols <= 65535 else 4
        return n * (nnz_pad * itemsize + 4)

    def _oversize_tier(self) -> Optional[str]:
        """None (packed fits — resident paths apply) | 'block' |
        'stream'. 'auto' prefers the device-resident-ELL block tier
        (no per-query host traffic) and only streams from host when
        even the compact ELL would crowd out the per-block transients
        (one packed block ~1 GB + selection buffers)."""
        if getattr(self, "_mesh", None) is not None:
            return None  # mesh shards rows; each shard fits its chip
        if self.search_mode in ("stream", "block"):
            return self.search_mode
        if (self.search_mode == "auto"
                and jax.default_backend() == "tpu"
                and self._packed_bytes() > self._budget()):
            return ("block" if self._ell_device_bytes()
                    <= self._budget() - (3 << 30) else "stream")
        return None

    def _use_stream(self) -> bool:
        return self._oversize_tier() == "stream"

    def _use_block_ell(self) -> bool:
        return self._oversize_tier() == "block"

    def _get_block_ell(self):
        """One-time upload of the compact ELL (uint16 cols) for the
        block tier; padding columns beyond the corpus-wide max nnz are
        trimmed first (less HBM, less per-block pack work)."""
        if getattr(self, "_block_ell", None) is None:
            cache = getattr(self, "_host_cache", None)
            if cache is not None:
                cols, nnz = cache
            else:
                cols = np.asarray(self.ell.cols)
                nnz = np.asarray(self.ell.nnz)
            nnz = np.ascontiguousarray(nnz, dtype=np.int32)
            mx = -(-max(int(nnz.max()), 1) // 8) * 8
            if mx < cols.shape[1]:
                cols = cols[:, :mx]
            dt = np.uint16 if self.ell.num_cols <= 65535 else np.int32
            # sentinel pads (>= num_cols) survive the cast when vocab
            # <= 65535; the pack kernel masks anything outside [0, V)
            cols = np.ascontiguousarray(cols, dtype=dt)
            self._block_ell = (jnp.asarray(cols), jnp.asarray(nnz))
        return self._block_ell

    # Block tier candidate selection on the int8 MXU (~2x the bf16
    # scoring rate on v5e) with an exact f32 rerank of block_cand_budget
    # survivors (0 -> 2k). Measured at 21M/B=1024/k=100: recall 1.0 vs
    # exact at cand=2k (docs/probe_int8_scorer.json); set False to pin
    # the bf16 bucketed scorer.
    block_int8 = True
    block_cand_budget = 0

    def _block_selection(self) -> str:
        sel = self._resolved_selection()
        if not sel.startswith("bucketed"):
            return "exact"
        if self.block_int8 and self.ell.vals is None:
            return "bucketed_int8"
        return "bucketed"

    def _block_search(self, q, k: int):
        from ..ops.bitpack import bitpack_blockwise_topk

        cols_d, nnz_d = self._get_block_ell()
        sel = self._block_selection()
        key = ("blk", q.shape[0], k, sel, self.block_cand_budget)
        if getattr(self, "_block_fn", None) is None \
                or self._block_fn[0] != key:
            num_cols = self.ell.num_cols
            block = self.stream_block_rows
            cand = self.block_cand_budget
            fn = jax.jit(lambda qq, c, z: bitpack_blockwise_topk(
                qq, c, z, num_cols=num_cols, k=k, block_rows=block,
                selection=sel, cand_budget=cand))
            self._block_fn = (key, fn)
        return self._block_fn[1](q, cols_d, nnz_d)

    def _get_streamer(self):
        from .streamed import StreamedBitpackSearcher

        if getattr(self, "_streamer", None) is None:
            cache = getattr(self, "_host_cache", None)
            if cache is not None:
                cols, nnz = cache
            else:
                # device-resident ELL forced into stream mode: pull the
                # compact ELL back once (NOT the 16-32x larger bitmat)
                cols = np.asarray(self.ell.cols)
                nnz = np.asarray(self.ell.nnz)
            sel = self._resolved_selection()
            self._streamer = StreamedBitpackSearcher(
                cols, nnz, self.ell.num_cols,
                block_rows=self.stream_block_rows,
                selection=("bucketed" if sel.startswith("bucketed")
                           else "exact"))
        return self._streamer

    def _use_bitpack(self) -> bool:
        if self.search_mode == "bitpack":
            return True
        if self.search_mode != "auto":
            return False
        # On TPU the bit-packed kernel wins at EVERY probed size (round-2
        # crossover probe, device-resident queries: 66 vs 78 ms/128-query
        # batch at 5k rows, 72 vs 112 ms at 131k — the kernel itself is
        # 1-3 ms there; the exact gather path only grows from that).
        # Off-TPU the kernel runs in interpret mode, so keep the gather
        # path for small indexes.
        if jax.default_backend() == "tpu":
            return True
        return self.ell.shape[0] > self.exact_threshold

    def build_bitpack(self):
        from ..ops.bitpack import pack_ell

        self.bitmat = pack_ell(self.ell,
                               host_arrays=getattr(self, "_host_cache",
                                                   None))
        return self.bitmat

    def set_ell(self, ell, host_cache=None):
        super().set_ell(ell)
        self.bitmat = None
        # (cols, nnz) numpy copies let bitpacking skip the
        # device->host transfer
        self._host_cache = host_cache

    def set_vectors(self, mat):
        super().set_vectors(mat)
        self.bitmat = None

    def _mesh_use_blockwise(self, shards: int) -> bool:
        """Shard the COMPACT ELL (blockwise per-shard scoring) instead
        of the packed bits when the per-shard packed matrix would not
        fit a chip. Explicit 'block'/'stream' modes also shard the ELL:
        both declare >HBM intent, and under a mesh the block tier is the
        right answer (each shard's ELL is 1/shards the size)."""
        if self.search_mode in ("block", "stream"):
            return True
        n = self.ell.shape[0]
        rows_per = -(-n // shards)
        return (self.search_mode == "auto"
                and jax.default_backend() == "tpu"
                and self._packed_bytes(rows_per, None) > self._budget())

    def to_mesh(self, mesh, axis_name: str = "dp"):
        """Row-shard over the mesh. The bit-packed scorer shards too, so
        sharded BoT search keeps the Pallas MXU path per shard; when
        even the PER-SHARD packed matrix exceeds HBM, the compact ELL
        shards instead and each chip scores blockwise (the mesh form of
        the single-chip block tier — ~34M rows/chip ELL-resident)."""
        if self._mesh_use_blockwise(mesh.shape[axis_name]):
            from ..ops.ell import ELLMatrix
            from ..parallel.sharded_search import shard_ell

            cache = getattr(self, "_host_cache", None)
            if cache is not None:
                cols, nnz = cache
            else:
                cols = np.asarray(self.ell.cols)
                nnz = np.asarray(self.ell.nnz)
            nnz = np.ascontiguousarray(nnz, dtype=np.int32)
            # trim + downcast exactly like the single-chip block tier
            mx = -(-max(int(nnz.max()), 1) // 8) * 8
            if mx < cols.shape[1]:
                cols = np.ascontiguousarray(cols[:, :mx])
            dt = np.uint16 if self.ell.num_cols <= 65535 else np.int32
            cols = np.ascontiguousarray(cols, dtype=dt)
            self._true_rows = self.ell.shape[0]
            self._mesh_ell = shard_ell(
                mesh, ELLMatrix(cols=cols, nnz=nnz, vals=None,
                                num_cols=self.ell.num_cols,
                                sentinel_padded=False), axis_name)
            self._mesh = (mesh, axis_name)
            self._search_fn = None
            return self
        if self._use_bitpack():
            from ..ops.bitpack import pack_ell
            from ..parallel.sharded_search import shard_bitmat

            if self.bitmat is None:
                self.bitmat = pack_ell(
                    self.ell, host_arrays=getattr(self, "_host_cache",
                                                  None))
            self._true_rows = self.ell.shape[0]
            self.bitmat = shard_bitmat(mesh, self.bitmat, axis_name)
            self._mesh = (mesh, axis_name)
            self._search_fn = None
            return self
        return super().to_mesh(mesh, axis_name)

    def _mesh_blockwise_search(self, q, k: int) -> SearchResults:
        from ..parallel.sharded_search import \
            make_sharded_blockwise_search

        mesh, axis_name = self._mesh
        k = min(k, self._true_rows)
        sel = self._block_selection()
        key = ("mblk", k, sel)
        if self._search_fn is None or self._search_fn[0] != key:
            fn = make_sharded_blockwise_search(
                mesh, k, self._true_rows, self._mesh_ell, axis_name,
                selection=sel, block_rows=self.stream_block_rows)
            self._search_fn = (key, fn)
        ids, scores = self._search_fn[1](q, self._mesh_ell)
        return SearchResults(np.asarray(ids), np.asarray(scores))

    def search(self, q_embs, k: int,
               num_candidates=None) -> SearchResults:
        if getattr(q_embs, "shape", (1,))[0] == 0:
            # every bit-packed path (resident/block/stream/mesh) lowers
            # B=0 into the Pallas kernels, which reject it with a
            # cryptic Mosaic error; answer the empty batch directly
            rows = getattr(self, "_true_rows", None) or self.ell.shape[0]
            k0 = min(k, rows)
            return SearchResults(np.zeros((0, k0), np.int32),
                                 np.zeros((0, k0), np.float32))
        mesh_info = getattr(self, "_mesh", None)
        if getattr(self, "_mesh_ell", None) is not None:
            q = (q_embs.astype(jnp.float32)
                 if isinstance(q_embs, jax.Array) else
                 jnp.asarray(np.asarray(q_embs), dtype=jnp.float32))
            if q.shape[-1] != self.ell.num_cols:
                raise ValueError(
                    f"query dim {q.shape[-1]} != index dim "
                    f"{self.ell.num_cols}")
            return self._mesh_blockwise_search(q, k)
        tier = self._oversize_tier()
        if tier is not None:
            q = (q_embs.astype(jnp.float32)
                 if isinstance(q_embs, jax.Array) else
                 jnp.asarray(np.asarray(q_embs), dtype=jnp.float32))
            if q.shape[-1] != self.ell.num_cols:
                raise ValueError(
                    f"query dim {q.shape[-1]} != index dim "
                    f"{self.ell.num_cols}")
            k = min(k, self.ell.shape[0])
            if tier == "block":
                ids, scores = self._block_search(q, k)
                return SearchResults(np.asarray(ids),
                                     np.asarray(scores))
            ids, scores = self._get_streamer().search(q, k)
            return SearchResults(ids, scores)
        if not self._use_bitpack() or (
                mesh_info is not None and self.bitmat is None):
            return super().search(q_embs, k,
                                  num_candidates=num_candidates)
        from ..ops.bitpack import bitpack_topk_search

        if self.bitmat is None:
            self.build_bitpack()
        q = (q_embs.astype(jnp.float32)
             if isinstance(q_embs, jax.Array) else
             jnp.asarray(np.asarray(q_embs), dtype=jnp.float32))
        if q.shape[-1] != self.ell.num_cols:
            # prepare_queries would silently zero-pad a misaligned
            # (e.g. unshifted) query up to the packed bit width and
            # return plausible-looking wrong scores — validate like
            # the exact path does
            raise ValueError(
                f"query dim {q.shape[-1]} != index dim "
                f"{self.ell.num_cols}")
        k = min(k, self.ell.shape[0])
        if mesh_info is not None:
            from ..parallel.sharded_search import \
                make_sharded_bitpack_search

            mesh, axis_name = mesh_info
            sel = self._resolved_selection()
            shard_sel = ("bucketed" if sel.startswith("bucketed")
                         else "exact")
            key = ("bm", k, shard_sel)
            if self._search_fn is None or self._search_fn[0] != key:
                fn = make_sharded_bitpack_search(mesh, k, self.bitmat,
                                                 axis_name,
                                                 selection=shard_sel)
                self._search_fn = (key, fn)
            ids, scores = self._search_fn[1](q, self.bitmat)
            return SearchResults(np.asarray(ids), np.asarray(scores))
        sel = self._resolved_selection()
        # the recall knob is baked into the jitted fn via closure, so
        # it must be part of the cache key or changing it is ignored
        key = ("b", k, sel, self.approx_recall_target)
        if self._search_fn is None or self._search_fn[0] != key:
            if sel in ("bucketed", "bucketed_approx"):
                from ..ops.bitpack import bitpack_bucketed_topk

                fn = jax.jit(lambda q, bm: bitpack_bucketed_topk(
                    q, bm, k=k, approx_final=(sel == "bucketed_approx"),
                    recall_target=self.approx_recall_target))
            else:
                fn = jax.jit(lambda q, bm: bitpack_topk_search(
                    q, bm, k=k, approx=(sel == "approx"),
                    recall_target=self.approx_recall_target))
            self._search_fn = (key, fn)
        ids, scores = self._search_fn[1](q, self.bitmat)
        return SearchResults(np.asarray(ids), np.asarray(scores))
