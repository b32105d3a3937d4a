"""Nonnegative activations for vocabulary-space embeddings.

TPU-native counterpart of the reference's sparse-vector primitives
(reference: src/ir/utils/sparse.py:6). All functions are pure and jit-able.
"""
from __future__ import annotations

import jax


def elu1p(x: jax.Array) -> jax.Array:
    """``elu(x) + 1``: a smooth, strictly-positive activation.

    Maps raw vocabulary logits to nonnegative term weights
    (reference: src/ir/utils/sparse.py:6). On TPU this fuses into the
    producing matmul's epilogue under XLA.
    """
    return jax.nn.elu(x) + 1.0
