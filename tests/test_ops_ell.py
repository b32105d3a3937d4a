"""Tests for the ELL sparse container and scoring vs dense references."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from vsearch_tpu.ops import (
    ELLMatrix,
    ell_matvec_scores,
    dense_topk_search,
    merge_shard_topk,
)


def random_sparse(rng, n, v, density=0.05):
    mat = sp.random(n, v, density=density, random_state=np.random.RandomState(0),
                    format="csr", dtype=np.float32)
    mat.data[:] = rng.normal(size=mat.data.shape).astype(np.float32)
    return mat


def test_ell_from_scipy_roundtrip(rng):
    mat = random_sparse(rng, 17, 300)
    ell = ELLMatrix.from_scipy_csr(mat)
    assert ell.shape == (17, 300)
    assert ell.nnz_pad % 128 == 0
    back = ell.to_scipy_csr()
    np.testing.assert_allclose(back.toarray(), mat.toarray(), rtol=1e-6)
    dense = np.asarray(ell.to_dense())
    np.testing.assert_allclose(dense, mat.toarray(), rtol=1e-6)


def test_ell_from_dense(rng):
    d = rng.normal(size=(5, 40)).astype(np.float32)
    d[d < 0.5] = 0.0
    ell = ELLMatrix.from_dense(d)
    np.testing.assert_allclose(np.asarray(ell.to_dense()), d, rtol=1e-6)


def test_ell_binary(rng):
    mat = random_sparse(rng, 9, 128)
    mat.data[:] = 1.0
    ell = ELLMatrix.from_scipy_csr(mat, binary=True)
    assert ell.is_binary
    np.testing.assert_allclose(np.asarray(ell.to_dense()), mat.toarray())


def test_ell_matvec_scores_matches_dense(rng):
    mat = random_sparse(rng, 57, 333, density=0.1)
    ell = ELLMatrix.from_scipy_csr(mat)
    q = jnp.asarray(rng.normal(size=(4, 333)).astype(np.float32))
    scores = np.asarray(ell_matvec_scores(q, ell, block_rows=16))
    expect = np.asarray(q) @ mat.toarray().T
    np.testing.assert_allclose(scores, expect, rtol=1e-4, atol=1e-4)


def test_ell_matvec_binary_matches_dense(rng):
    mat = random_sparse(rng, 30, 200, density=0.08)
    mat.data[:] = 1.0
    ell = ELLMatrix.from_scipy_csr(mat, binary=True)
    q = jnp.asarray(rng.normal(size=(3, 200)).astype(np.float32))
    scores = np.asarray(ell_matvec_scores(q, ell, block_rows=8))
    expect = np.asarray(q) @ mat.toarray().T
    np.testing.assert_allclose(scores, expect, rtol=1e-4, atol=1e-4)


def test_dense_topk_search(rng):
    p = rng.normal(size=(50, 64)).astype(np.float32)
    q = rng.normal(size=(3, 64)).astype(np.float32)
    ids, scores = dense_topk_search(jnp.asarray(q), jnp.asarray(p), k=5)
    expect_scores = q @ p.T
    for b in range(3):
        order = np.argsort(-expect_scores[b])[:5]
        np.testing.assert_array_equal(np.asarray(ids)[b], order)
        np.testing.assert_allclose(np.asarray(scores)[b],
                                   expect_scores[b][order], rtol=1e-5)


def test_merge_shard_topk(rng):
    # two shards of 10 rows each; global search must equal merged result
    p = rng.normal(size=(20, 32)).astype(np.float32)
    q = rng.normal(size=(2, 32)).astype(np.float32)
    all_scores = q @ p.T
    shard_ids, shard_scores = [], []
    for s in range(2):
        block = p[s * 10:(s + 1) * 10]
        ids, scores = dense_topk_search(jnp.asarray(q), jnp.asarray(block), k=4)
        shard_ids.append(np.asarray(ids) + s * 10)
        shard_scores.append(np.asarray(scores))
    mids, mscores = merge_shard_topk(
        jnp.asarray(np.stack(shard_ids)), jnp.asarray(np.stack(shard_scores)),
        k=4)
    for b in range(2):
        order = np.argsort(-all_scores[b])[:4]
        np.testing.assert_array_equal(np.asarray(mids)[b], order)
