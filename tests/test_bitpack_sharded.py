"""Sharded bit-packed BoT search on the 8-device CPU mesh (Pallas kernel
in interpret mode inside shard_map)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax

from vsearch_tpu.index import BoTIndex
from vsearch_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=8, tp=1)


def test_sharded_bitpack_matches_single(mesh, rng):
    mat = sp.random(300, 200, density=0.12, format="csr",
                    dtype=np.float32,
                    random_state=np.random.RandomState(41))
    mat.data[:] = 1.0
    q = np.abs(rng.normal(size=(3, 200))).astype(np.float32)

    single = BoTIndex(search_mode="bitpack")
    single.set_vectors(mat)
    res1 = single.search(q, k=6)

    sharded = BoTIndex(search_mode="bitpack")
    sharded.set_vectors(mat)
    sharded.to_mesh(mesh)
    assert sharded.bitmat.words.shape[0] % 8 == 0
    res2 = sharded.search(q, k=6)

    exact = q @ mat.toarray().T
    for i in range(3):
        # both paths must return the exact top-6 scores (ids may differ
        # under ties)
        np.testing.assert_allclose(
            np.sort(res2.scores[i])[::-1],
            np.sort(exact[i])[::-1][:6], rtol=5e-3, atol=0.05)
        np.testing.assert_allclose(res1.scores[i], res2.scores[i],
                                   rtol=5e-3, atol=0.05)
        # returned ids must be valid rows
        assert (res2.ids[i] < 300).all() and (res2.ids[i] >= 0).all()


def test_sharded_bucketed_guard_large_k(mesh, rng):
    """Advisor (round 2): k=300 on a 2000-row sharded index with
    selection='bucketed' crashed the merge ('top_k must be no larger
    than size'), and k near the per-shard bucket count silently lost
    recall. The factory must fall back to exact per-shard selection
    when k*BUCKET > rows_per."""
    from vsearch_tpu.ops.bitpack import pack_dense
    from vsearch_tpu.parallel.sharded_search import (
        make_sharded_bitpack_search, shard_bitmat)

    n, v, k = 2000, 256, 300
    dense = (rng.random((n, v)) < 0.1).astype(np.float32)
    q = np.abs(rng.normal(size=(2, v))).astype(np.float32)
    bm = shard_bitmat(mesh, pack_dense(dense))
    fn = make_sharded_bitpack_search(mesh, k=k, bitmat=bm,
                                     selection="bucketed")
    ids, scores = fn(jax.numpy.asarray(q), bm)
    ids, scores = np.asarray(ids), np.asarray(scores)
    assert np.isfinite(scores).all()
    assert (ids < n).all()
    exact = q @ dense.T
    for i in range(2):
        assert len(set(ids[i].tolist())) == k
        np.testing.assert_allclose(np.sort(scores[i])[::-1],
                                   np.sort(exact[i])[::-1][:k],
                                   rtol=8e-3, atol=0.05)


def test_sharded_bitpack_k_exceeds_rows_raises(mesh, rng):
    from vsearch_tpu.ops.bitpack import pack_dense
    from vsearch_tpu.parallel.sharded_search import (
        make_sharded_bitpack_search, shard_bitmat)

    dense = (rng.random((100, 128)) < 0.1).astype(np.float32)
    bm = shard_bitmat(mesh, pack_dense(dense))
    with pytest.raises(ValueError, match="exceeds index rows"):
        make_sharded_bitpack_search(mesh, k=101, bitmat=bm)


def test_sharded_blockwise_guards(mesh, rng):
    """make_sharded_blockwise_search rejects k > rows and real-valued
    (vals) ELLs; pad demotion keeps ids in range with negative-free
    binary scores."""
    from vsearch_tpu.ops.ell import ELLMatrix
    from vsearch_tpu.parallel.sharded_search import (
        make_sharded_blockwise_search, shard_ell)

    n, v = 90, 256
    cols = np.stack([rng.choice(v, size=5, replace=False)
                     for _ in range(n)]).astype(np.int32)
    nnz = np.full(n, 5, np.int32)
    ell = shard_ell(mesh, ELLMatrix(cols=cols, nnz=nnz, vals=None,
                                    num_cols=v, sentinel_padded=False))
    with pytest.raises(ValueError, match="exceeds index rows"):
        make_sharded_blockwise_search(mesh, k=91, num_rows=n,
                                      ell_template=ell)

    vals = np.ones((n, 5), np.float32)
    ell_v = shard_ell(mesh, ELLMatrix(cols=cols, nnz=nnz, vals=vals,
                                      num_cols=v, sentinel_padded=False))
    with pytest.raises(ValueError, match="binary"):
        make_sharded_blockwise_search(mesh, k=5, num_rows=n,
                                      ell_template=ell_v)

    fn = make_sharded_blockwise_search(mesh, k=80, num_rows=n,
                                       ell_template=ell, block_rows=16,
                                       selection="exact")
    q = np.abs(rng.normal(size=(2, v))).astype(np.float32)
    ids, scores = fn(q, ell)
    ids = np.asarray(ids)
    assert (ids < n).all() and (ids >= 0).all()
    assert np.isfinite(np.asarray(scores)).all()


def test_sharded_blockwise_int8_rerank_exact_scores(mesh, rng):
    """selection='bucketed_int8' composes with the mesh factory: each
    shard runs int8 candidate selection + exact f32 rerank locally,
    the ICI merge is over exact scores. Returned ids must carry their
    TRUE f32 row scores (rerank exactness survives sharding), and the
    seeded case recovers the exact top-k."""
    from vsearch_tpu.ops.ell import ELLMatrix
    from vsearch_tpu.parallel.sharded_search import (
        make_sharded_blockwise_search, shard_ell)

    n, v, k, nnz_c = 2560, 256, 5, 12
    cols = np.stack([rng.choice(v, size=nnz_c, replace=False)
                     for _ in range(n)]).astype(np.int32)
    nnz = np.full(n, nnz_c, np.int32)
    q = np.zeros((2, v), np.float32)
    for i in range(2):
        active = rng.choice(v, size=48, replace=False)
        q[i, active] = 0.25 + rng.random(48).astype(np.float32)

    ell = shard_ell(mesh, ELLMatrix(cols=cols, nnz=nnz, vals=None,
                                    num_cols=v, sentinel_padded=False))
    fn = make_sharded_blockwise_search(mesh, k=k, num_rows=n,
                                       ell_template=ell,
                                       selection="bucketed_int8")
    ids, scores = fn(jax.numpy.asarray(q), ell)
    ids, scores = np.asarray(ids), np.asarray(scores)
    assert (ids < n).all() and (ids >= 0).all()
    for i in range(2):
        for j in range(k):
            true = np.float32(q[i, cols[ids[i, j], :nnz_c]].sum())
            np.testing.assert_allclose(scores[i, j], true, rtol=1e-6)
    exact = np.stack([
        np.sort(np.array([q[i, cols[r, :nnz_c]].sum()
                          for r in range(n)], np.float32))[::-1][:k]
        for i in range(2)])
    np.testing.assert_allclose(np.sort(scores, 1)[:, ::-1], exact,
                               rtol=1e-6)
