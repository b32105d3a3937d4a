"""Fused int8 vocab-projection head: quantized GEMM + dequant + masked
max-pool in one Pallas kernel.

The VDR head projects BERT hidden states onto the vocabulary embedding
matrix and max-pools over the sequence (reference:
src/ir/encoder/vdr.py:58-84). On the MXU, int8 matmul runs at ~2x bf16
throughput (measured 228.7 TOP/s vs ~167 TF/s at the head shape,
docs/NEXT_ROUND.md round 3), but a plain XLA int8 head was measured
SLOWER end-to-end: the f32 dequantize multiply materializes the full
[B*L, V'] logits between the GEMM and the pooling reduction, and that
HBM round trip costs more than the faster GEMM saves.

This kernel keeps the logits tile-resident: each grid step computes an
int8 [MB*L, H] x [H, VT] MXU matmul, dequantizes, masks and max-pools
over L entirely in VMEM, writing only the [MB, VT] pooled slab. The
[B*L, V'] intermediate never exists.

Quantization scheme: symmetric per-token activation scales (amax/127
over the hidden axis — activations after LayerNorm vary per token) and
per-vocab-row weight scales. elu1p commutes with max and is applied by
the caller on the pooled [B, V'] output.

Weight quantization runs per forward (the projection is a traced
input, so XLA cannot hoist it across calls): one pass over the
[V', H] f32 weights ~ 0.15 ms at HBM bandwidth, ~1.5% of the fused
head — accepted rather than caching (w8, wscale) outside the jit,
which would go stale silently when params update mid-training.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 128


def quantize_rows(x: jax.Array, eps: float = 1e-12):
    """Symmetric int8 quantization along the last axis.

    Returns ``(x8, scale)`` with ``x ~= x8 * scale[..., None]``.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 127.0 + eps
    x8 = jnp.clip(jnp.round(xf / scale[..., None]), -127,
                  127).astype(jnp.int8)
    return x8, scale


def _head_kernel(x8_ref, rs_ref, m_ref, w8_ref, ws_ref, out_ref):
    mb, l, h = x8_ref.shape
    vt = w8_ref.shape[0]
    x = x8_ref[:].reshape(mb * l, h)
    # int8 x int8 -> int32 on the MXU
    acc = jax.lax.dot_general(
        x, w8_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)  # [MB*L, VT]
    lg = acc.astype(jnp.float32).reshape(mb, l, vt)
    lg = lg * rs_ref[:][:, :, None] * ws_ref[:][:, None, :]
    lg = jnp.where(m_ref[:][:, :, None] > 0, lg, -jnp.inf)
    out_ref[:] = jnp.max(lg, axis=1)


@functools.partial(jax.jit, static_argnames=("vt", "interpret"))
def int8_head_pool(h: jax.Array, proj: jax.Array, valid: jax.Array,
                   vt: int = 512,
                   interpret: Optional[bool] = None) -> jax.Array:
    """Masked max over L of ``h @ proj.T`` via fused int8 tiles.

    h: [B, L, H] hidden states (bf16/f32), proj: [V, H] vocab embedding
    rows, valid: [B, L] bool/int pooling mask. Returns [B, V] f32 (raw
    pooled logits, pre-elu1p); rows with no valid position come back
    -inf, matching the XLA path. V and H are padded internally to lane
    multiples; output is sliced back to V.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, l, hdim = h.shape
    v = proj.shape[0]

    x8, rscale = quantize_rows(h)
    w8, wscale = quantize_rows(proj)

    v_pad = (-v) % vt
    if v_pad:
        w8 = jnp.pad(w8, ((0, v_pad), (0, 0)))
        wscale = jnp.pad(wscale, (0, v_pad))
    h_pad = (-hdim) % LANE
    if h_pad:
        x8 = jnp.pad(x8, ((0, 0), (0, 0), (0, h_pad)))
        w8 = jnp.pad(w8, ((0, 0), (0, h_pad)))
    vp = v + v_pad

    # rows per grid step: keep the GEMM M-dim >= ~1024 (K=768 matmuls
    # on this target need both M and N large, scripts/probe_embed_mfu.py)
    mb = max(1, 1024 // l)
    while b % mb:
        mb //= 2
    mask = valid.astype(jnp.float32)
    ws2 = wscale.reshape(1, vp)

    grid = (b // mb, vp // vt)
    out = pl.pallas_call(
        _head_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((mb, l, x8.shape[2]), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((mb, l), lambda i, j: (i, 0)),
            pl.BlockSpec((mb, l), lambda i, j: (i, 0)),
            pl.BlockSpec((vt, w8.shape[1]), lambda i, j: (j, 0)),
            pl.BlockSpec((1, vt), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((mb, vt), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((b, vp), jnp.float32),
        interpret=interpret,
    )(x8, rscale, mask, w8, ws2)
    return out[:, :v]
