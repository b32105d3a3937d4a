"""Host-streamed >HBM search (index/streamed.py): exactness vs the
resident path, block/tail handling, and BoTIndex dispatch."""
import numpy as np
import pytest

from vsearch_tpu.index import BoTIndex
from vsearch_tpu.index.streamed import StreamedBitpackSearcher
from vsearch_tpu.ops.bitpack import pack_ell_host
from vsearch_tpu.ops.ell import ELLMatrix


def make_binary_ell(n, v, nnz_max, seed=0):
    rng = np.random.default_rng(seed)
    nnz = rng.integers(1, nnz_max + 1, size=n).astype(np.int32)
    nnz_pad = 8
    cols = np.zeros((n, nnz_pad), dtype=np.int32)
    for i in range(n):
        cols[i, : nnz[i]] = rng.choice(v, size=nnz[i], replace=False)
    return cols, nnz


def exact_topk_host(q, cols, nnz, k):
    n = cols.shape[0]
    scores = np.zeros((q.shape[0], n), dtype=np.float32)
    for i in range(n):
        scores[:, i] = q[:, cols[i, : nnz[i]]].sum(axis=1)
    ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return ids, np.take_along_axis(scores, ids, axis=1)


@pytest.mark.parametrize("n", [96, 130])  # multi-block + ragged tail
def test_streamed_matches_exact(n):
    v = 500
    cols, nnz = make_binary_ell(n, v, nnz_max=8, seed=1)
    rng = np.random.default_rng(2)
    q = np.zeros((4, v), dtype=np.float32)
    for i in range(4):
        active = rng.choice(v, size=32, replace=False)
        q[i, active] = rng.random(32).astype(np.float32)

    k = 10
    s = StreamedBitpackSearcher(cols, nnz, v, block_rows=64)
    assert s.n_blocks >= 1
    ids, scores = s.search(q, k)

    ids_e, scores_e = exact_topk_host(q, cols, nnz, k)
    # the scoring kernel computes in bf16 (exact for 0/1 bits, ~3
    # decimal digits for the query weights) — compare at bf16 tolerance;
    # the bit-exact check vs the resident kernel is a separate test
    np.testing.assert_allclose(scores, scores_e, rtol=2e-2)
    for i in range(4):
        got = np.zeros(s.num_rows + 1, np.float32)
        for j in range(cols.shape[0]):
            got[j] = q[i, cols[j, : nnz[j]]].sum()
        kth = scores_e[i, -1]
        assert (got[ids[i]] >= kth - 2e-2 * max(kth, 1.0)).all()


def test_streamed_uint16_downcast_and_singleblock():
    v = 300
    cols, nnz = make_binary_ell(40, v, nnz_max=8, seed=3)
    s = StreamedBitpackSearcher(cols, nnz, v, block_rows=1 << 18)
    assert s.cols.dtype == np.uint16
    assert s.n_blocks == 1
    q = np.random.default_rng(4).random((2, v)).astype(np.float32)
    ids, scores = s.search(q, 5)
    ids_e, scores_e = exact_topk_host(q, cols, nnz, 5)
    np.testing.assert_allclose(scores, scores_e, rtol=2e-2)


def test_streamed_matches_resident_bitpack():
    """The streamed path must return the same scores as packing the
    whole matrix resident and scoring it (the <=HBM production path)."""
    from vsearch_tpu.ops.bitpack import bitpack_topk_search
    import jax.numpy as jnp

    v = 400
    cols, nnz = make_binary_ell(200, v, nnz_max=8, seed=5)
    q = np.random.default_rng(6).random((3, v)).astype(np.float32)
    k = 7

    bm = pack_ell_host(cols, nnz, v)
    ids_r, scores_r = bitpack_topk_search(jnp.asarray(q), bm, k=k)
    s = StreamedBitpackSearcher(cols, nnz, v, block_rows=64)
    ids_s, scores_s = s.search(q, k)
    np.testing.assert_allclose(scores_s, np.asarray(scores_r),
                               rtol=1e-5)


def test_bot_index_stream_dispatch():
    """search_mode='stream' routes through the streamer; results match
    the default path on the same index."""
    v = 400
    cols, nnz = make_binary_ell(150, v, nnz_max=8, seed=7)
    ell = ELLMatrix(cols=cols, nnz=nnz, vals=None, num_cols=v,
                    sentinel_padded=False)

    idx = BoTIndex(search_mode="stream")
    idx.stream_block_rows = 64
    idx.set_ell(ell, host_cache=(cols, nnz))
    assert idx._use_stream()
    q = np.random.default_rng(8).random((2, v)).astype(np.float32)
    res = idx.search(q, k=5)

    idx2 = BoTIndex()
    idx2.set_ell(ell, host_cache=(cols, nnz))
    assert not idx2._use_stream()  # small index, off-TPU: resident path
    res2 = idx2.search(q, k=5)
    # resident small-index path scores in f32; streamed kernel in bf16
    np.testing.assert_allclose(res.scores, res2.scores, rtol=2e-2)


def test_stream_mode_rejected_on_real_valued():
    from vsearch_tpu.index import SparseIndex

    with pytest.raises(ValueError, match="stream"):
        SparseIndex(search_mode="stream")


def test_streamer_reset_on_reload():
    """set_ell must drop the cached streamer (stale corpus answers)."""
    v = 300
    cols, nnz = make_binary_ell(100, v, nnz_max=8, seed=9)
    idx = BoTIndex(search_mode="stream")
    idx.stream_block_rows = 64
    idx.set_ell(ELLMatrix(cols=cols, nnz=nnz, vals=None, num_cols=v,
                          sentinel_padded=False),
                host_cache=(cols, nnz))
    q = np.random.default_rng(10).random((1, v)).astype(np.float32)
    idx.search(q, k=3)
    assert idx._streamer is not None
    cols2, nnz2 = make_binary_ell(80, v, nnz_max=8, seed=11)
    idx.set_ell(ELLMatrix(cols=cols2, nnz=nnz2, vals=None, num_cols=v,
                          sentinel_padded=False),
                host_cache=(cols2, nnz2))
    assert idx._streamer is None
    res = idx.search(q, k=3)
    assert res.ids.max() < 80


# -- device-resident-ELL block tier (ops/bitpack.bitpack_blockwise_topk) --

def test_blockwise_matches_resident_bitpack():
    """Blockwise repack-and-score == packing the whole matrix resident
    (the <=HBM production path), including multi-block + ragged tail."""
    import jax.numpy as jnp

    from vsearch_tpu.ops.bitpack import (bitpack_blockwise_topk,
                                         bitpack_topk_search)

    v = 400
    cols, nnz = make_binary_ell(330, v, nnz_max=8, seed=21)
    q = np.random.default_rng(22).random((3, v)).astype(np.float32)
    k = 9

    bm = pack_ell_host(cols, nnz, v)
    ids_r, scores_r = bitpack_topk_search(jnp.asarray(q), bm, k=k)
    ids_b, scores_b = bitpack_blockwise_topk(
        jnp.asarray(q), jnp.asarray(cols.astype(np.uint16)),
        jnp.asarray(nnz), num_cols=v, k=k, block_rows=128,
        selection="exact")
    np.testing.assert_allclose(np.asarray(scores_b),
                               np.asarray(scores_r), rtol=1e-5)


def test_blockwise_fused_merge_matches_two_step():
    """The fused bucketed path (one top_k over [B, m+k] per block) must
    equal the composition it replaced — per-block bucketed top-k then
    an explicit running merge — given the SAME kernel keys (same
    bucket, so identical collisions/quantization). Every returned
    (id, score) pair must also be a genuine row with that true score
    up to the key splice's <=2^-13 relative quantization."""
    import jax.numpy as jnp

    from vsearch_tpu.ops.bitpack import (BitMatrix, _pack_fn,
                                         bitpack_blockwise_topk,
                                         bitpack_bucketed_topk)

    v = 500
    n, block, k, bucket = 2500, 1024, 16, 16
    rng = np.random.default_rng(31)
    nnz_pad = 8
    nnz = rng.integers(4, nnz_pad + 1, size=n).astype(np.int32)
    cols = np.zeros((n, nnz_pad), dtype=np.int32)
    for i in range(n):
        cols[i, : nnz[i]] = rng.choice(v, size=nnz[i], replace=False)
    q = rng.random((3, v)).astype(np.float32)

    ids_f, s_f = bitpack_blockwise_topk(
        jnp.asarray(q), jnp.asarray(cols.astype(np.uint16)),
        jnp.asarray(nnz), num_cols=v, k=k, block_rows=block,
        selection="bucketed", bucket=bucket)
    ids_f, s_f = np.asarray(ids_f), np.asarray(s_f)

    # reference: per-block bucketed top-k + explicit merge
    pack = _pack_fn(block, nnz_pad, v, True)
    best_s = np.full((3, k), -np.inf, np.float32)
    best_i = np.zeros((3, k), np.int32)
    for row0 in range(0, n, block):
        ce = cols[row0: row0 + block]
        ne = nnz[row0: row0 + block]
        true_rows = ce.shape[0]
        if true_rows < block:
            ce = np.pad(ce, ((0, block - true_rows), (0, 0)))
            ne = np.pad(ne, ((0, block - true_rows),))
        bm = BitMatrix(words=pack(jnp.asarray(ce), jnp.asarray(ne)),
                       num_rows=true_rows, num_cols=v)
        i_b, s_b = bitpack_bucketed_topk(jnp.asarray(q), bm, k=k,
                                         bucket=bucket, interpret=True)
        cat_s = np.concatenate([best_s, np.asarray(s_b)], axis=1)
        cat_i = np.concatenate([best_i, np.asarray(i_b) + row0], axis=1)
        sel = np.argsort(-cat_s, axis=1, kind="stable")[:, :k]
        best_s = np.take_along_axis(cat_s, sel, axis=1)
        best_i = np.take_along_axis(cat_i, sel, axis=1)

    np.testing.assert_array_equal(np.sort(s_f, 1), np.sort(best_s, 1))
    # id/score pairs are genuine rows at their true scores (the kernel
    # consumes bf16-rounded queries, so score in that basis; remaining
    # slack is the key splice's <=2^-13 relative quantization)
    qb = np.asarray(jnp.asarray(q).astype(jnp.bfloat16)
                    .astype(jnp.float32))
    for bq in range(3):
        for j in range(k):
            r = ids_f[bq, j]
            true = np.float32(qb[bq, cols[r, : nnz[r]]].sum())
            assert abs(true - s_f[bq, j]) <= 2 ** -12 * max(true, 1.0)


def test_blockwise_int8_selection_matches_exact():
    """selection='bucketed_int8' (int8-MXU candidate selection + exact
    f32 rerank) must return true rows at their exact f32 scores, and
    the whole pipeline must equal a numpy simulation of its selection
    semantics: per-query int8 quantization -> integer row scores ->
    strided-bucket max keys -> global top-cand -> exact f32 rerank.
    (Comparing against the unbucketed exact top-k instead would test
    the bucket-collision rate of an adversarially dense synthetic, not
    the kernel — the production margin is measured at 21M shapes in
    docs/probe_int8_scorer.json.)"""
    import jax.numpy as jnp

    from vsearch_tpu.ops.bitpack import (INT8_KEY_SHIFT, ROW_BLOCK,
                                         bitpack_blockwise_topk)

    v = 500
    n, block, k, bucket, cand = 2500, 1024, 8, 16, 64
    rng = np.random.default_rng(41)
    nnz_pad = 8
    nnz = rng.integers(4, nnz_pad + 1, size=n).astype(np.int32)
    cols = np.zeros((n, nnz_pad), dtype=np.int32)
    for i in range(n):
        cols[i, : nnz[i]] = rng.choice(v, size=nnz[i], replace=False)
    q = np.zeros((3, v), dtype=np.float32)
    for i in range(3):
        active = rng.choice(v, size=64, replace=False)
        q[i, active] = rng.random(64).astype(np.float32)

    ids_8, s_8 = bitpack_blockwise_topk(
        jnp.asarray(q), jnp.asarray(cols.astype(np.uint16)),
        jnp.asarray(nnz), num_cols=v, k=k, block_rows=block,
        selection="bucketed_int8", bucket=bucket, cand_budget=cand)
    ids_8, s_8 = np.asarray(ids_8), np.asarray(s_8)

    # (a) rerank exactness: every returned id scores exactly its true
    # f32 row score (rerank gathers f32 query weights, no bf16)
    for bq in range(3):
        for j in range(k):
            r = ids_8[bq, j]
            true = np.float32(q[bq, cols[r, : nnz[r]]].sum())
            np.testing.assert_allclose(s_8[bq, j], true, rtol=1e-6)

    # (b) full selection-semantics simulation in numpy
    kb = ROW_BLOCK // bucket
    q8 = np.round(q * (127.0 / q.max(axis=1, keepdims=True))
                  ).astype(np.int64)
    for bq in range(3):
        row_s = np.array([q8[bq, cols[i, : nnz[i]]].sum()
                          for i in range(n)], dtype=np.int64)
        all_keys, all_gids = [], []
        for row0 in range(0, n, block):
            rows = np.arange(row0, min(row0 + block, n))
            local = rows - row0
            keys = (row_s[rows] << INT8_KEY_SHIFT) | local
            for p in range(kb):
                sel = keys[local % kb == p]
                if sel.size:
                    best = sel.max()
                    all_keys.append(best)
                    all_gids.append(row0 + (best & (ROW_BLOCK - 1)))
        order = np.argsort(-np.asarray(all_keys), kind="stable")[:cand]
        cand_ids = np.asarray(all_gids)[order]
        # exact f32 rerank of the simulated candidate set
        cs = np.array([np.float32(q[bq, cols[i, : nnz[i]]].sum())
                       for i in cand_ids], dtype=np.float32)
        top = np.sort(cs)[::-1][:k]
        np.testing.assert_allclose(np.sort(s_8[bq])[::-1], top,
                                   rtol=1e-6)


def test_blockwise_int8_small_n_falls_back_exact():
    """cand * bucket > n: the int8 path must fall back to exact
    selection (the bucket fold would leave < cand candidates) and still
    return exact results."""
    import jax.numpy as jnp

    from vsearch_tpu.ops.bitpack import bitpack_blockwise_topk

    v = 300
    cols, nnz = make_binary_ell(70, v, nnz_max=6, seed=25)
    q = np.random.default_rng(26).random((2, v)).astype(np.float32)
    ids_b, scores_b = bitpack_blockwise_topk(
        jnp.asarray(q), jnp.asarray(cols), jnp.asarray(nnz),
        num_cols=v, k=10, block_rows=64, selection="bucketed_int8")
    ids_e, scores_e = exact_topk_host(q, cols, nnz, 10)
    np.testing.assert_allclose(np.asarray(scores_b), scores_e,
                               rtol=2e-2)


def test_blockwise_k_exceeds_tail():
    """Tail block shorter than k must pad, not crash, and results stay
    exact vs host scoring."""
    import jax.numpy as jnp

    from vsearch_tpu.ops.bitpack import bitpack_blockwise_topk

    v = 300
    cols, nnz = make_binary_ell(70, v, nnz_max=6, seed=23)
    q = np.random.default_rng(24).random((2, v)).astype(np.float32)
    k = 10  # tail block has 70 - 64 = 6 rows < k
    ids_b, scores_b = bitpack_blockwise_topk(
        jnp.asarray(q), jnp.asarray(cols), jnp.asarray(nnz),
        num_cols=v, k=k, block_rows=64, selection="exact")
    ids_e, scores_e = exact_topk_host(q, cols, nnz, k)
    np.testing.assert_allclose(np.asarray(scores_b), scores_e,
                               rtol=2e-2)


def test_bot_index_block_dispatch():
    """search_mode='block' uploads the compact ELL once and matches the
    default resident path; reload drops the cached device ELL."""
    v = 400
    cols, nnz = make_binary_ell(150, v, nnz_max=8, seed=25)
    ell = ELLMatrix(cols=cols, nnz=nnz, vals=None, num_cols=v,
                    sentinel_padded=False)

    idx = BoTIndex(search_mode="block")
    idx.stream_block_rows = 64
    idx.set_ell(ell, host_cache=(cols, nnz))
    assert idx._oversize_tier() == "block"
    q = np.random.default_rng(26).random((2, v)).astype(np.float32)
    res = idx.search(q, k=5)
    assert idx._block_ell is not None
    assert idx._block_ell[0].dtype == np.uint16  # v <= 65535

    idx2 = BoTIndex()
    idx2.set_ell(ell, host_cache=(cols, nnz))
    res2 = idx2.search(q, k=5)
    np.testing.assert_allclose(res.scores, res2.scores, rtol=2e-2)

    cols2, nnz2 = make_binary_ell(80, v, nnz_max=8, seed=27)
    idx.set_ell(ELLMatrix(cols=cols2, nnz=nnz2, vals=None, num_cols=v,
                          sentinel_padded=False),
                host_cache=(cols2, nnz2))
    assert idx._block_ell is None
    res3 = idx.search(q, k=5)
    assert res3.ids.max() < 80


def test_block_mode_rejected_on_real_valued():
    from vsearch_tpu.index import SparseIndex

    with pytest.raises(ValueError, match="block"):
        SparseIndex(search_mode="block")


def test_load_index_search_mode_passthrough(tmp_path):
    """retriever.load_index(search_mode=...) reaches the index ctor (it
    decides host vs device residency at LOAD time) and errors on dense."""
    import pytest

    from vsearch_tpu.index import BoTIndex
    from vsearch_tpu.retriever import Retriever, RetrieverConfig

    v = 300
    cols, nnz = make_binary_ell(60, v, nnz_max=6, seed=31)
    idx = BoTIndex()
    idx.set_ell(ELLMatrix(cols=cols, nnz=nnz, vals=None, num_cols=v,
                          sentinel_padded=False))
    path = str(tmp_path / "tiny.bot.npz")
    idx.save(path)

    ir = Retriever.__new__(Retriever)  # no encoders needed for load
    ir.index = None
    loaded = ir.load_index(index_file=path, search_mode="stream")
    assert loaded.search_mode == "stream"
    q = np.random.default_rng(32).random((2, v)).astype(np.float32)
    res = loaded.search(q, k=4)
    assert res.ids.shape == (2, 4)

    with pytest.raises(ValueError, match="dense"):
        ir.load_index(index_file=path, index_type="dense",
                      search_mode="block")


def test_empty_query_batch_all_modes():
    """B=0 lowered into the Pallas kernels dies with a cryptic Mosaic
    error; every BoT path must answer the empty batch directly."""
    v = 300
    cols, nnz = make_binary_ell(50, v, nnz_max=6, seed=41)
    q0 = np.zeros((0, v), np.float32)
    for mode in ("exact", "bitpack", "block", "stream"):
        idx = BoTIndex(search_mode=mode)
        idx.stream_block_rows = 64
        idx.set_ell(ELLMatrix(cols=cols, nnz=nnz, vals=None,
                              num_cols=v, sentinel_padded=False),
                    host_cache=(cols, nnz))
        res = idx.search(q0, k=5)
        assert res.ids.shape == (0, 5)
        assert res.scores.shape == (0, 5)


def test_streamer_forwards_selection():
    """The stream tier must honor the index's resolved selection policy
    (ADVICE r4: _get_streamer always built selection='exact', making
    the --selection knob a silent no-op in stream mode)."""
    v = 400
    cols, nnz = make_binary_ell(150, v, nnz_max=8, seed=7)
    ell = ELLMatrix(cols=cols, nnz=nnz, vals=None, num_cols=v,
                    sentinel_padded=False)
    idx = BoTIndex(search_mode="stream", selection="bucketed")
    idx.stream_block_rows = 64
    idx.set_ell(ell, host_cache=(cols, nnz))
    assert idx._get_streamer().selection == "bucketed"

    idx2 = BoTIndex(search_mode="stream", selection="exact")
    idx2.stream_block_rows = 64
    idx2.set_ell(ell, host_cache=(cols, nnz))
    assert idx2._get_streamer().selection == "exact"

    # 'auto' resolves by size: a small index resolves to exact
    idx3 = BoTIndex(search_mode="stream")
    idx3.stream_block_rows = 64
    idx3.set_ell(ell, host_cache=(cols, nnz))
    assert idx3._get_streamer().selection == \
        ("bucketed" if idx3._resolved_selection().startswith("bucketed")
         else "exact")
