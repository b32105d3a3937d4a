"""Index layer tests: build/search/save/load round-trips, scipy interop."""
import json

import numpy as np
import pytest
import scipy.sparse as sp

from vsearch_tpu.index import BoTIndex, DenseIndex, IndexType, SparseIndex
from vsearch_tpu.ops.ell import ELLMatrix


@pytest.fixture
def dense_data(rng):
    vecs = rng.normal(size=(40, 96)).astype(np.float32)
    texts = [f"passage number {i}" for i in range(40)]
    return vecs, texts


def brute_topk(q, mat, k):
    scores = q @ mat.T
    return np.argsort(-scores, axis=1)[:, :k]


def test_dense_index_search(dense_data, rng):
    vecs, texts = dense_data
    idx = DenseIndex(dtype=np.float32)
    idx.set_vectors(vecs)
    idx.data = texts
    q = rng.normal(size=(3, 96)).astype(np.float32)
    res = idx.search(q, k=5)
    assert res.ids.shape == (3, 5)
    expect = brute_topk(q, vecs, 5)
    # bf16/f32 scoring may swap near-ties; check top-1 and set overlap
    assert (res.ids[:, 0] == expect[:, 0]).all()
    for b in range(3):
        assert len(set(res.ids[b]) & set(expect[b])) >= 4
    assert idx.get_sample(int(res.ids[0, 0])) == texts[res.ids[0, 0]]


def test_dense_index_save_load(tmp_path, dense_data):
    vecs, texts = dense_data
    idx = DenseIndex()
    idx.set_vectors(vecs)
    path = str(tmp_path / "dense.npz")
    idx.save(path)
    idx2 = DenseIndex(index_file=path)
    assert tuple(idx2.vector.shape) == (40, 96)
    np.testing.assert_allclose(
        np.asarray(idx2.vector, dtype=np.float32),
        np.asarray(idx.vector, dtype=np.float32), rtol=1e-2, atol=1e-2)


def test_dense_index_torch_pt_interop(tmp_path, dense_data):
    torch = pytest.importorskip("torch")
    vecs, _ = dense_data
    path = str(tmp_path / "dense.pt")
    torch.save(torch.from_numpy(vecs), path)
    idx = DenseIndex(index_file=path, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(idx.vector), vecs, rtol=1e-6)


def test_sparse_index_search_and_npz_roundtrip(tmp_path, rng):
    mat = sp.random(60, 200, density=0.1, format="csr", dtype=np.float32,
                    random_state=np.random.RandomState(3))
    idx = SparseIndex()
    idx.set_vectors(mat)
    q = rng.normal(size=(2, 200)).astype(np.float32)
    res = idx.search(q, k=4)
    expect = brute_topk(q, mat.toarray(), 4)
    np.testing.assert_array_equal(res.ids, expect)

    # scipy-compatible npz round-trip (f16 on disk, like the reference)
    path = str(tmp_path / "sparse_index.npz")
    idx.save(path)
    loaded = sp.load_npz(path)
    assert loaded.dtype == np.float16
    loaded32 = sp.csr_matrix(
        (loaded.data.astype(np.float32), loaded.indices, loaded.indptr),
        shape=loaded.shape)
    np.testing.assert_allclose(loaded32.toarray(), mat.toarray(),
                               rtol=1e-3, atol=1e-3)
    idx2 = SparseIndex(index_file=path)
    res2 = idx2.search(q, k=4)
    np.testing.assert_array_equal(res2.ids, expect)


def test_sparse_index_native_roundtrip(tmp_path, rng):
    mat = sp.random(30, 150, density=0.08, format="csr", dtype=np.float32,
                    random_state=np.random.RandomState(4))
    idx = SparseIndex()
    idx.set_vectors(mat)
    path = str(tmp_path / "index.ell.npz")
    idx.save(path)
    idx2 = SparseIndex(index_file=path)
    q = rng.normal(size=(2, 150)).astype(np.float32)
    np.testing.assert_array_equal(idx2.search(q, 3).ids,
                                  idx.search(q, 3).ids)


def test_native_load_rejects_inconsistent_shards(tmp_path, rng):
    """Mixed-vocab shard files must error, not silently corrupt: the
    loader previously took num_cols from whichever file it read last."""
    for i, v in enumerate([100, 120]):
        mat = sp.random(20, v, density=0.1, format="csr",
                        dtype=np.float32,
                        random_state=np.random.RandomState(i))
        idx = SparseIndex()
        idx.set_vectors(mat)
        idx.save(str(tmp_path / f"mix{i}.ell.npz"))
    with pytest.raises(ValueError, match="inconsistent index shard"):
        SparseIndex(index_file=str(tmp_path / "mix*.ell.npz"))


def test_sparse_index_sharded_glob_load(tmp_path, rng):
    shards = [sp.random(20, 100, density=0.1, format="csr",
                        dtype=np.float32,
                        random_state=np.random.RandomState(s))
              for s in range(3)]
    for i, s in enumerate(shards):
        sp.save_npz(str(tmp_path / f"shard{i}.npz"), s.tocsr())
    idx = SparseIndex(index_file=str(tmp_path / "shard*.npz"))
    assert idx.ell.shape == (60, 100)
    full = sp.vstack(shards).toarray()
    q = rng.normal(size=(2, 100)).astype(np.float32)
    np.testing.assert_array_equal(idx.search(q, 5).ids,
                                  brute_topk(q, full, 5))


def test_bot_index_binary(rng):
    mat = sp.random(25, 80, density=0.15, format="csr", dtype=np.float32,
                    random_state=np.random.RandomState(5))
    mat.data[:] = 1.0
    idx = BoTIndex()
    idx.set_vectors(mat)
    assert idx.ell.is_binary
    assert idx.index_type == IndexType.BAG_OF_TOKEN
    q = rng.normal(size=(2, 80)).astype(np.float32)
    np.testing.assert_array_equal(idx.search(q, 3).ids,
                                  brute_topk(q, mat.toarray(), 3))


def test_low_memory_lazy_data(tmp_path):
    rows = [{"text": f"passage {i}"} for i in range(10)]
    p1 = tmp_path / "a.jsonl"
    p2 = tmp_path / "b.jsonl"
    p1.write_text("\n".join(json.dumps(r) for r in rows[:6]) + "\n")
    p2.write_text("\n".join(json.dumps(r) for r in rows[6:]) + "\n")
    idx = DenseIndex(low_memory=True)
    idx.load_data([str(p1), str(p2)])
    assert len(idx) == 10
    assert idx.get_sample(0) == rows[0]
    assert idx.get_sample(7) == rows[7]
    assert idx.get_sample(9) == rows[9]


def test_bot_auto_policy_resolution(monkeypatch, rng):
    """'auto' resolves: bitpack scoring always on TPU; selection exact
    below bucketed_threshold, fused bucketed above."""
    import jax as _jax
    import scipy.sparse as sp

    from vsearch_tpu.index import BoTIndex

    mat = sp.random(50, 64, density=0.2, format="csr", dtype=np.float32,
                    random_state=np.random.RandomState(3))
    mat.data[:] = 1.0
    idx = BoTIndex()
    idx.set_vectors(mat)

    # on CPU, small indexes keep the gather path
    assert not idx._use_bitpack()
    assert idx._resolved_selection() == "exact"

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    assert idx._use_bitpack()
    assert idx._resolved_selection() == "exact"  # 50 rows < threshold

    class FakeEll:
        shape = (idx.bucketed_threshold + 1, 64)

    idx.ell = FakeEll()
    assert idx._resolved_selection() == "bucketed"
    idx.selection = "bucketed_approx"
    assert idx._resolved_selection() == "bucketed_approx"


def test_move_to_device_compat_shim(rng):
    """Reference API compat: index.move_to_device(device) exists and is
    a no-op returning self (reference src/ir/retriever/index.py:54-57;
    JAX arrays are device-resident on creation)."""
    idx = DenseIndex()
    idx.set_vectors(rng.normal(size=(10, 8)).astype(np.float32))
    assert idx.move_to_device("tpu:0") is idx
    sp_idx = SparseIndex()
    sp_idx.set_vectors(sp.random(10, 20, density=0.2, format="csr",
                                 dtype=np.float32))
    assert sp_idx.move_to_device() is sp_idx


def test_load_index_infers_bot_from_valueless_ell(tmp_path, rng):
    """Retriever.load_index must classify a native .ell.npz archive by
    content: no stored values = binary bag-of-token, values = sparse.
    Previously every .npz mapped to SPARSE, so a BoT index built by the
    binary_token_index CLI lost its BoT selection/rerank surface."""
    from vsearch_tpu.index import IndexType
    from vsearch_tpu.index.bot_build import build_bot_ell, save_bot_host
    from vsearch_tpu.retriever import Retriever, RetrieverConfig

    class TokStub:
        vocab_size = 50

        def encode_batch(self, texts, max_length):
            return [[7, 9, 11] for _ in texts]

    _, cols, nnz = build_bot_ell(TokStub(), ["a", "b"], shift=5,
                                 return_host=True, device=False)
    bot_path = str(tmp_path / "bot.ell.npz")
    save_bot_host(bot_path, cols, nnz, num_cols=45)

    r = Retriever.__new__(Retriever)  # skip encoder construction
    r.index = None
    r.load_index(bot_path)
    assert r.index_type == IndexType.BAG_OF_TOKEN

    mat = sp.random(6, 45, density=0.2, format="csr", dtype=np.float32,
                    random_state=np.random.RandomState(0))
    sp_idx = SparseIndex()
    sp_idx.set_vectors(mat)
    sp_path = str(tmp_path / "real.ell.npz")
    sp_idx.save(sp_path)
    r.load_index(sp_path)
    assert r.index_type == IndexType.SPARSE


def test_build_bot_ell_rejects_shift_beyond_vocab():
    """A shift >= vocab_size would produce a negative column space and
    die deep inside scipy; it must fail with a clear error instead."""
    from vsearch_tpu.index.bot_build import build_bot_ell

    class TokStub:
        vocab_size = 149

        def encode_batch(self, texts, max_length):
            return [[1] for _ in texts]

    with pytest.raises(ValueError, match="shift.*vocab_size"):
        build_bot_ell(TokStub(), ["x"], shift=999)


def test_bot_reload_drops_stale_bitmat(tmp_path, rng):
    """init_index on a BoTIndex that already searched must rebuild the
    packed bit matrix — a stale bitmat would silently answer queries
    against the OLD corpus (review finding, round 3)."""
    from vsearch_tpu.index.bot_build import save_bot_host

    def make_ell_file(path, seed):
        r = np.random.default_rng(seed)
        mat = (r.random((30, 64)) < 0.2).astype(np.float32)
        width = int(mat.sum(axis=1).max())
        cols = np.full((30, width), 64, np.int32)
        nnz = np.zeros(30, np.int32)
        for i in range(30):
            nz = np.nonzero(mat[i])[0]
            cols[i, : len(nz)] = nz
            nnz[i] = len(nz)
        save_bot_host(str(path), cols, nnz, 64)
        return mat

    mat_a = make_ell_file(tmp_path / "a.ell.npz", 1)
    mat_b = make_ell_file(tmp_path / "b.ell.npz", 2)
    idx = BoTIndex(search_mode="bitpack")
    idx.init_index(str(tmp_path / "a.ell.npz"))
    q = rng.random((2, 64)).astype(np.float32)
    res_a = idx.search(q, k=3)
    assert idx.bitmat is not None
    idx.init_index(str(tmp_path / "b.ell.npz"))
    assert idx.bitmat is None  # stale pack dropped
    res_b = idx.search(q, k=3)
    del res_a  # searched only to materialize the pack for corpus A
    # compare SCORES (tie-robust): results must reflect corpus B
    best_b = (q @ mat_b.T).max(axis=1)
    # bf16 packing: ~1e-3 relative
    np.testing.assert_allclose(np.asarray(res_b.scores)[:, 0], best_b,
                               rtol=5e-3)


def test_bitpack_path_validates_query_dim(rng):
    """The BoT bitpack path must reject misaligned query dims instead
    of silently zero-padding them to the packed bit width (review
    finding, round 3)."""
    mat = (rng.random((20, 64)) < 0.3).astype(np.float32)
    idx = BoTIndex(search_mode="bitpack")
    idx.set_vectors(sp.csr_matrix(mat))
    with pytest.raises(ValueError, match="query dim"):
        idx.search(rng.random((2, 80)).astype(np.float32), k=3)


def test_sparse_candidate_count_clamped(rng):
    """User-supplied num_candidates below k (or above n) must clamp,
    not crash the rerank's top_k (review finding, round 3)."""
    mat = sp.random(200, 80, density=0.1, format="csr",
                    dtype=np.float32,
                    random_state=np.random.RandomState(3))
    mat.data[:] = np.abs(mat.data)
    for mode in ("bitproxy",):
        idx = SparseIndex(search_mode=mode)
        idx.set_ell(ELLMatrix.from_scipy_csr(mat))
        q = np.abs(rng.normal(size=(2, 80))).astype(np.float32)
        res = idx.search(q, k=5, num_candidates=2)  # < k
        assert np.asarray(res.ids).shape == (2, 5)
        res = idx.search(q, k=5, num_candidates=10_000)  # > n
        assert np.asarray(res.ids).shape == (2, 5)


def test_binary_proxy_large_k_fallback(rng):
    """k beyond the bucket capacity falls back to exact selection over
    support scores instead of crashing (review finding, round 3)."""
    from vsearch_tpu.ops.bitpack import pack_ell
    from vsearch_tpu.ops.two_stage import binary_proxy_search

    mat = sp.random(300, 64, density=0.15, format="csr",
                    dtype=np.float32,
                    random_state=np.random.RandomState(5))
    mat.data[:] = np.abs(mat.data)
    ell = ELLMatrix.from_scipy_csr(mat)
    bm = pack_ell(ell)
    q = np.abs(rng.normal(size=(2, 64))).astype(np.float32)
    import jax.numpy as jnp
    # bucket capacity = 1024 // 8 = 128 < k=200
    ids, scores = binary_proxy_search(jnp.asarray(q), ell, bm, k=200,
                                      num_candidates=250)
    assert ids.shape == (2, 200)
    assert (np.asarray(ids) < 300).all()


def test_recall_target_change_recompiles(rng):
    """Changing approx_recall_target after a search must take effect —
    it is baked into the compiled fn via closure (review finding,
    round 3)."""
    vecs = rng.normal(size=(64, 32)).astype(np.float32)
    idx = DenseIndex(dtype=np.float32)
    idx.set_vectors(vecs)
    idx.selection = "approx"
    q = rng.normal(size=(2, 32)).astype(np.float32)
    idx.search(q, k=4)
    fn_before = idx._search_fn
    idx.approx_recall_target = 0.8
    idx.search(q, k=4)
    assert idx._search_fn[0] != fn_before[0]


def test_dense_reload_after_to_mesh_resets_sharding(rng):
    """set_vectors after to_mesh must drop the sharded-search state
    (stale _true_rows / mesh fn would mis-mask the new data — review
    finding, round 3)."""
    import jax
    from vsearch_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device backend")
    vecs = rng.normal(size=(40, 16)).astype(np.float32)
    idx = DenseIndex(dtype=np.float32)
    idx.set_vectors(vecs)
    idx.to_mesh(make_mesh(dp=len(jax.devices()), tp=1))
    assert idx._mesh is not None
    new = rng.normal(size=(12, 16)).astype(np.float32)
    idx.set_vectors(new)
    assert idx._mesh is None and idx._true_rows is None
    res = idx.search(rng.normal(size=(2, 16)).astype(np.float32), k=3)
    assert (np.asarray(res.ids) < 12).all()


def test_bot_from_dense_stays_binary(tmp_path, rng):
    """BoTIndex.set_vectors(dense) must produce a valueless ELL:
    stored vals would re-classify the saved index as real-valued
    sparse on reload and silently disable beta rerank (review finding,
    round 3)."""
    from vsearch_tpu.retriever import Retriever

    mat = (rng.random((12, 64)) < 0.3).astype(np.float32)
    idx = BoTIndex()
    idx.set_vectors(mat)  # dense ndarray path
    assert idx.ell.vals is None and idx.ell.is_binary
    p = str(tmp_path / "dense_bot.ell.npz")
    idx.save(p)
    with np.load(p) as z:
        assert "vals" not in z.files
