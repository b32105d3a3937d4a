"""Unit tests for vocabulary-space primitives vs numpy references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsearch_tpu.ops import (
    elu1p,
    build_topk_mask,
    topk_sparsify,
    build_bow_mask,
    build_cts_mask,
    init_cts_mask_like,
)


def test_elu1p_positive_and_matches_numpy(rng):
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    y = elu1p(x)
    assert (np.asarray(y) > 0).all()
    expect = np.where(x > 0, x + 1.0, np.exp(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5, atol=1e-6)


def test_build_topk_mask(rng):
    x = rng.normal(size=(3, 100)).astype(np.float32)
    k = 7
    mask = np.asarray(build_topk_mask(jnp.asarray(x), k=k))
    assert mask.sum(axis=-1).tolist() == [k] * 3
    for i in range(3):
        top_idx = np.argsort(-x[i])[:k]
        assert set(np.nonzero(mask[i])[0]) == set(top_idx)


def test_build_topk_mask_other_axis(rng):
    x = rng.normal(size=(5, 6)).astype(np.float32)
    mask = np.asarray(build_topk_mask(jnp.asarray(x), k=2, axis=0))
    assert (mask.sum(axis=0) == 2).all()
    for j in range(6):
        assert set(np.nonzero(mask[:, j])[0]) == set(np.argsort(-x[:, j])[:2])


def test_topk_sparsify(rng):
    x = rng.normal(size=(2, 50)).astype(np.float32)
    out = np.asarray(topk_sparsify(jnp.asarray(x), k=5))
    assert ((out != 0).sum(axis=-1) <= 5).all()
    for i in range(2):
        nz = np.nonzero(out[i])[0]
        np.testing.assert_allclose(out[i, nz], x[i, nz])


def test_build_bow_mask_basic():
    ids = jnp.asarray([[1, 5, 5, 9], [0, 2, 3, 3]])
    bow = np.asarray(build_bow_mask(ids, vocab_size=12, shift_num=0))
    assert bow.shape == (2, 12)
    assert set(np.nonzero(bow[0])[0]) == {1, 5, 9}
    assert set(np.nonzero(bow[1])[0]) == {0, 2, 3}
    assert bow.max() == 1.0  # duplicates stay binary


def test_build_bow_mask_shift_and_norm():
    ids = jnp.asarray([[2, 5, 7]])
    bow = np.asarray(build_bow_mask(ids, vocab_size=10, shift_num=3))
    # ids below shift fall off; remaining activate at id - shift
    assert bow.shape == (1, 7)
    assert set(np.nonzero(bow[0])[0]) == {5 - 3, 7 - 3}
    bown = np.asarray(build_bow_mask(ids, vocab_size=10, shift_num=3,
                                     norm=True))
    np.testing.assert_allclose(np.linalg.norm(bown[0]), 1.0, rtol=1e-6)


def test_cts_mask_round_robin_and_exclusion():
    bow = jnp.asarray(
        [[1, 0, 0, 0, 0, 0, 1, 0],
         [0, 0, 1, 0, 0, 0, 0, 0]], dtype=jnp.float32)
    init = np.asarray(init_cts_mask_like(bow))
    # slot v belongs to row v % 2
    assert init[0].tolist() == [True, False] * 4
    assert init[1].tolist() == [False, True] * 4
    cts = np.asarray(build_cts_mask(bow))
    # slots 0, 2, 6 are active in the batch -> excluded everywhere
    assert not cts[:, 0].any() and not cts[:, 2].any() and not cts[:, 6].any()
    assert cts[0, 4]  # even, inactive slot -> row 0
    assert cts[1, 3] and cts[1, 5] and cts[1, 7]


def test_ops_jit_compile(rng):
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    f = jax.jit(lambda a: topk_sparsify(elu1p(a), k=16))
    out = f(x)
    assert out.shape == x.shape
    assert ((np.asarray(out) != 0).sum(-1) <= 16).all()


def test_build_topk_mask_clamps_oversized_k(rng):
    """k > dim clamps in the shared helper instead of crashing every
    call site individually (review finding, round 3)."""
    import jax.numpy as jnp

    from vsearch_tpu.ops.sparse import build_topk_mask

    x = jnp.asarray(rng.normal(size=(3, 10)).astype(np.float32))
    m = build_topk_mask(x, k=50)
    assert m.shape == (3, 10) and bool(m.all())
