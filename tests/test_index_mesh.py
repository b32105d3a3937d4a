"""Index-level mesh sharding: .to_mesh() must preserve search results."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax

from vsearch_tpu.index import BoTIndex, DenseIndex, SparseIndex
from vsearch_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=8, tp=1)


def test_dense_index_to_mesh(mesh, rng):
    vecs = rng.normal(size=(500, 48)).astype(np.float32)
    q = rng.normal(size=(3, 48)).astype(np.float32)
    idx = DenseIndex(dtype=np.float32)
    idx.set_vectors(vecs)
    before = idx.search(q, k=6)
    idx.to_mesh(mesh)
    after = idx.search(q, k=6)
    np.testing.assert_array_equal(before.ids, after.ids)


def test_sparse_index_to_mesh(mesh, rng):
    mat = sp.random(300, 120, density=0.1, format="csr",
                    dtype=np.float32,
                    random_state=np.random.RandomState(21))
    mat.data[:] = np.abs(mat.data)
    q = np.abs(rng.normal(size=(2, 120))).astype(np.float32)
    idx = SparseIndex(search_mode="exact")
    idx.set_vectors(mat)
    before = idx.search(q, k=5)
    idx.to_mesh(mesh)
    after = idx.search(q, k=5)
    np.testing.assert_array_equal(before.ids, after.ids)
    np.testing.assert_allclose(before.scores, after.scores, rtol=1e-4,
                               atol=1e-4)


def test_bot_index_to_mesh(mesh, rng):
    mat = sp.random(250, 90, density=0.15, format="csr",
                    dtype=np.float32,
                    random_state=np.random.RandomState(22))
    mat.data[:] = 1.0
    q = np.abs(rng.normal(size=(2, 90))).astype(np.float32)
    idx = BoTIndex(search_mode="exact")
    idx.set_vectors(mat)
    before = idx.search(q, k=4)
    idx.to_mesh(mesh)
    after = idx.search(q, k=4)
    np.testing.assert_array_equal(before.ids, after.ids)


def test_bot_block_tier_to_mesh(mesh, rng):
    """search_mode='block' under a mesh shards the COMPACT ELL and
    scores blockwise per shard (the >HBM-per-shard path); results must
    match the single-device resident search on the same data."""
    from vsearch_tpu.ops.ell import ELLMatrix

    n, v = 330, 400
    g = np.random.default_rng(33)
    cols = np.sort(
        np.stack([g.choice(v, size=8, replace=False)
                  for _ in range(n)]).astype(np.int32), axis=1)
    nnz = g.integers(3, 9, size=n).astype(np.int32)
    ell = ELLMatrix(cols=cols, nnz=nnz, vals=None, num_cols=v,
                    sentinel_padded=False)
    q = np.abs(g.normal(size=(3, v))).astype(np.float32)

    ref = BoTIndex(search_mode="exact")
    ref.set_ell(ell)
    before = ref.search(q, k=7)

    idx = BoTIndex(search_mode="block")
    idx.stream_block_rows = 64
    idx.set_ell(ELLMatrix(cols=cols, nnz=nnz, vals=None, num_cols=v,
                          sentinel_padded=False),
                host_cache=(cols, nnz))
    idx.to_mesh(mesh)
    assert idx._mesh_ell is not None
    assert idx._mesh_ell.cols.dtype == np.uint16  # v <= 65535
    after = idx.search(q, k=7)
    np.testing.assert_allclose(
        np.sort(after.scores, axis=1), np.sort(before.scores, axis=1),
        rtol=2e-2, atol=1e-4)
    # ids must agree where scores are distinct (ties can permute)
    np.testing.assert_array_equal(np.sort(after.ids, axis=1)
                                  [:, -3:],
                                  np.sort(before.ids, axis=1)[:, -3:])

    # reload drops the sharded state (stale-state regression class)
    cols2 = cols[:80]
    idx.set_ell(ELLMatrix(cols=cols2, nnz=nnz[:80], vals=None,
                          num_cols=v, sentinel_padded=False),
                host_cache=(cols2, nnz[:80]))
    assert idx._mesh_ell is None
    res = idx.search(q, k=5)
    assert res.ids.max() < 80


def test_bot_stream_mode_to_mesh_uses_blockwise(mesh, rng):
    """search_mode='stream' + mesh routes to the sharded block tier
    (host streaming is a single-device fallback; under a mesh the
    per-shard ELL is 1/shards the size and belongs on device)."""
    from vsearch_tpu.ops.ell import ELLMatrix

    n, v = 150, 300
    g = np.random.default_rng(34)
    cols = np.stack([g.choice(v, size=6, replace=False)
                     for _ in range(n)]).astype(np.int32)
    nnz = g.integers(2, 7, size=n).astype(np.int32)
    idx = BoTIndex(search_mode="stream")
    idx.set_ell(ELLMatrix(cols=cols, nnz=nnz, vals=None, num_cols=v,
                          sentinel_padded=False),
                host_cache=(cols, nnz))
    idx.to_mesh(mesh)
    assert idx._mesh_ell is not None
    assert idx._oversize_tier() is None  # mesh owns the rows now
    q = np.abs(g.normal(size=(2, v))).astype(np.float32)
    res = idx.search(q, k=4)
    assert res.ids.shape == (2, 4)
    assert res.ids.max() < n
