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
