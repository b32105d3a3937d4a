"""Bit-packed binary scoring tests (Pallas kernel in interpret mode on
CPU) vs dense references."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from vsearch_tpu.ops.bitpack import (BitMatrix, bitpack_scores,
                                     bitpack_topk_search, pack_dense,
                                     pack_ell)
from vsearch_tpu.ops.ell import ELLMatrix


@pytest.fixture(scope="module")
def binary_case(rng):
    dense = (rng.random((40, 300)) < 0.1).astype(np.float32)
    q = np.abs(rng.normal(size=(4, 300))).astype(np.float32)
    return dense, q


def test_pack_roundtrip_bits(binary_case):
    dense, _ = binary_case
    bm = pack_dense(dense)
    assert bm.num_rows == 40 and bm.num_cols == 300
    assert bm.words.shape[0] % 1024 == 0
    assert bm.padded_bits % 4096 == 0
    # unpack manually and compare
    words = np.asarray(bm.words)[:40]
    got = np.zeros_like(dense)
    for v in range(300):
        w = (v // 4096) * 128 + (v % 128)
        b = (v % 4096) // 128
        got[:, v] = (words[:, w] >> b) & 1
    np.testing.assert_array_equal(got, dense)


def test_pack_ell_matches_pack_dense(binary_case):
    dense, _ = binary_case
    ell = ELLMatrix.from_dense(dense)
    bm1 = pack_ell(ell)
    bm2 = pack_dense(dense)
    np.testing.assert_array_equal(np.asarray(bm1.words),
                                  np.asarray(bm2.words))


def test_bitpack_scores_exact(binary_case):
    dense, q = binary_case
    bm = pack_dense(dense)
    scores = np.asarray(bitpack_scores(jnp.asarray(q), bm))
    expect = q @ dense.T
    assert scores.shape == (4, 40)
    np.testing.assert_allclose(scores, expect, rtol=8e-3, atol=0.05)


def test_bitpack_topk(binary_case):
    dense, q = binary_case
    bm = pack_dense(dense)
    ids, scores = bitpack_topk_search(jnp.asarray(q), bm, k=5)
    expect = q @ dense.T
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(ids)[i],
                                      np.argsort(-expect[i])[:5])


def test_bot_index_bitpack_mode(rng):
    mat = sp.random(60, 200, density=0.1, format="csr", dtype=np.float32,
                    random_state=np.random.RandomState(31))
    mat.data[:] = 1.0
    from vsearch_tpu.index import BoTIndex

    idx = BoTIndex(search_mode="bitpack")
    idx.set_vectors(mat)
    q = np.abs(rng.normal(size=(3, 200))).astype(np.float32)
    res = idx.search(q, k=4)
    exact = q @ mat.toarray().T
    # compare top-k SCORES (ids can differ under ties)
    for i in range(3):
        np.testing.assert_allclose(np.sort(res.scores[i])[::-1],
                                   np.sort(exact[i])[::-1][:4],
                                   rtol=8e-3, atol=0.05)
    # exact mode agrees on scores
    idx2 = BoTIndex(search_mode="exact")
    idx2.set_vectors(mat)
    res2 = idx2.search(q, k=4)
    np.testing.assert_allclose(res.scores, res2.scores, rtol=8e-3,
                               atol=0.05)
