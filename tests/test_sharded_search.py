"""Sharded search tests on the virtual 8-device CPU mesh: results must
match single-device search exactly."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from vsearch_tpu.ops.ell import ELLMatrix, ell_matvec_chunked
from vsearch_tpu.parallel.mesh import make_mesh
from vsearch_tpu.parallel.sharded_search import (
    make_sharded_dense_search, make_sharded_ell_search, shard_ell,
    shard_rows)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh(dp=8, tp=1)


def test_sharded_dense_matches_single(mesh, rng):
    n, d, b, k = 1000, 64, 4, 10
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    sharded = shard_rows(mesh, jnp.asarray(vecs))
    assert sharded.shape[0] == 1000  # already divisible by 8
    fn = make_sharded_dense_search(mesh, k=k, num_rows=n)
    ids, scores = fn(jnp.asarray(q), sharded)
    expect = np.argsort(-(q @ vecs.T), axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(ids), expect)


def test_sharded_dense_with_padding(mesh, rng):
    """Padding rows must never surface, even when every real score is
    NEGATIVE (so zero-vector pad rows would otherwise win the top-k).
    Regression for the round-2 bug where ids >= num_rows leaked out."""
    n, d, b, k = 997, 32, 3, 7  # not divisible by 8 -> pads
    vecs = rng.normal(size=(n, d)).astype(np.float32) - 4.0
    q = np.abs(rng.normal(size=(b, d)).astype(np.float32)) + 0.5
    assert (q @ vecs.T).max() < 0  # pad rows score 0 > all real rows
    sharded = shard_rows(mesh, jnp.asarray(vecs))
    assert sharded.shape[0] % 8 == 0
    fn = make_sharded_dense_search(mesh, k=k, num_rows=n)
    ids, scores = fn(jnp.asarray(q), sharded)
    assert np.asarray(ids).max() < n
    expect = np.argsort(-(q @ vecs.T), axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(ids), expect)


def test_sharded_ell_with_padding_negative_scores(mesh, rng):
    """Same regression for the ELL path: real rows score negative, pad
    rows (empty: nnz=0) score 0 — ids must stay < num_rows."""
    n, v, k = 777, 160, 9  # 777 % 8 != 0 -> shard_ell pads
    mat = sp.random(n, v, density=0.08, format="csr", dtype=np.float32,
                    random_state=np.random.RandomState(21))
    mat.data[:] = -np.abs(mat.data) - 0.1   # all-negative values
    ell = ELLMatrix.from_scipy_csr(mat)
    q = np.abs(rng.normal(size=(3, v))).astype(np.float32) + 0.1
    exact = q @ mat.toarray().T
    assert exact.max() < 0
    sharded = shard_ell(mesh, ell)
    fn = make_sharded_ell_search(
        mesh, k=k, ell_template=sharded, num_rows=n,
        score_fn=lambda qq, shard: ell_matvec_chunked(qq, shard,
                                                      chunk_rows=100))
    ids, scores = fn(jnp.asarray(q), sharded)
    ids = np.asarray(ids)
    assert ids.max() < n
    for i in range(3):
        np.testing.assert_array_equal(ids[i], np.argsort(-exact[i])[:k])


def test_sharded_ell_matches_single(mesh, rng):
    mat = sp.random(800, 200, density=0.08, format="csr",
                    dtype=np.float32,
                    random_state=np.random.RandomState(11))
    mat.data[:] = np.abs(mat.data)
    ell = ELLMatrix.from_scipy_csr(mat)
    q = np.abs(rng.normal(size=(3, 200))).astype(np.float32)

    sharded = shard_ell(mesh, ell)
    fn = make_sharded_ell_search(
        mesh, k=9, ell_template=sharded,
        score_fn=lambda qq, shard: ell_matvec_chunked(qq, shard,
                                                      chunk_rows=100))
    ids, scores = fn(jnp.asarray(q), sharded)
    exact = q @ mat.toarray().T
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(ids)[i],
                                      np.argsort(-exact[i])[:9])
        np.testing.assert_allclose(np.asarray(scores)[i],
                                   np.sort(exact[i])[::-1][:9],
                                   rtol=1e-4, atol=1e-4)


def test_sharded_ell_binary(mesh, rng):
    mat = sp.random(640, 150, density=0.1, format="csr",
                    dtype=np.float32,
                    random_state=np.random.RandomState(12))
    mat.data[:] = 1.0
    ell = ELLMatrix.from_scipy_csr(mat, binary=True)
    q = np.abs(rng.normal(size=(2, 150))).astype(np.float32)
    sharded = shard_ell(mesh, ell)
    fn = make_sharded_ell_search(
        mesh, k=5, ell_template=sharded,
        score_fn=lambda qq, shard: ell_matvec_chunked(qq, shard,
                                                      chunk_rows=80))
    ids, _ = fn(jnp.asarray(q), sharded)
    exact = q @ mat.toarray().T
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(ids)[i],
                                      np.argsort(-exact[i])[:5])
