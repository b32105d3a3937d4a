"""Decompose the block-tier per-block cost at wiki21m shapes.

The 21M block tier (ops/bitpack.bitpack_blockwise_topk) measured 107
TF/s effective vs 160-178 resident; the NEXT_ROUND hypothesis is that
the gap lives in the repack + selection at block shapes. This probe
times each component of ONE steady-state block iteration (B=1024,
block_rows=262144, nnz<=128, V=30522) so the fusion work targets the
real cost:

  pack        - lane-major Pallas repack of the block's ELL
  keys        - fused score+bucket kernel alone (keys [m, B] int32)
  topk_f32    - current selection: decode keys -> scores/gids (f32,
                ~5 elementwise [m,B] passes) + lax.top_k on f32
  topk_int    - candidate selection directly on int32 keys + decode
                of only the k winners (the fused-merge candidate)
  topk_approx - lax.approx_max_k on the f32 scores
  merge       - running top-k merge of two [B,k] lists
  block_iter  - one full current-path block iteration (jitted)

Run alone on the TPU:
    env -u JAX_PLATFORMS python scripts/probe_block_parts.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vsearch_tpu.utils.claim_guard import register_tpu_process

register_tpu_process("probe_block_parts")
from vsearch_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax
import jax.numpy as jnp

from vsearch_tpu.ops import bitpack as bp

V = 30522
NNZ_PAD = 128
BLOCK = 262144
B = 1024
K = 100


def _force(r):
    # block_until_ready does NOT flush the tunnel's async queue on this
    # backend — only a host readback forces execution (see bench.py)
    x = r[0] if isinstance(r, tuple) else r
    np.asarray(jnp.sum(x[:8].astype(jnp.int32)))


def timeit(fn, *args, iters=8):
    """Queue ``iters`` dispatches, force ONCE at the end: kernels
    serialize on-device, so dt/iters is per-run cost plus one ~31 ms
    tunnel RTT amortized over the batch."""
    r = fn(*args)
    _force(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _force(r)
    return (time.perf_counter() - t0) / iters, r


def main():
    rng = np.random.default_rng(0)
    stride = V // NNZ_PAD
    r = rng.integers(0, stride, size=(BLOCK, NNZ_PAD), dtype=np.uint16)
    base = (np.arange(NNZ_PAD, dtype=np.uint16) * stride)[None, :]
    cols = jnp.asarray((r + base).astype(np.int32))
    nnz = jnp.asarray(rng.integers(48, 97, size=BLOCK).astype(np.int32))
    q = jnp.asarray(np.abs(rng.normal(size=(B, V))).astype(np.float32))

    out = {"device": str(jax.devices()[0]), "block_rows": BLOCK, "b": B}

    pack = bp._pack_fn(BLOCK, NNZ_PAD, V, False)
    t, words = timeit(pack, cols, nnz)
    out["pack_ms"] = round(t * 1e3, 2)
    bm = bp.BitMatrix(words=words, num_rows=BLOCK, num_cols=V)

    # fused score+bucket kernel alone
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    row_block = bp.ROW_BLOCK
    kb = row_block // bp.BUCKET
    m = BLOCK // bp.BUCKET
    kern = bp._make_bucketed_kernel(bm.num_ktiles, row_block, B,
                                    V, BLOCK, bp.BUCKET)
    vp = bm.padded_bits

    @jax.jit
    def keys_only(words, qT):
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((m, B), jnp.int32),
            grid=(BLOCK // row_block,),
            in_specs=[
                pl.BlockSpec((row_block, bm.words.shape[1]),
                             lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((vp, B), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((kb, B), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        return f(words, qT)

    qT = bp.prepare_queries(q, bm)
    t, keys = timeit(keys_only, bm.words, qT)
    out["keys_ms"] = round(t * 1e3, 2)
    flops = B * BLOCK * V * 2
    out["keys_tfs"] = round(flops / t / 1e12, 1)

    idx_mask = row_block - 1

    @jax.jit
    def topk_f32(keys):
        local = keys & idx_mask
        scores = jax.lax.bitcast_convert_type(keys & ~idx_mask,
                                              jnp.float32)
        scores = jnp.where(keys < 0, -jnp.inf, scores)
        block_id = (jnp.arange(m, dtype=jnp.int32) // kb)[:, None]
        gids = block_id * row_block + local
        s, pos = jax.lax.top_k(scores.T, K)
        ids = jnp.take_along_axis(gids.T, pos, axis=1)
        return ids, s

    t, (ids_f, s_f) = timeit(topk_f32, keys)
    out["topk_f32_ms"] = round(t * 1e3, 2)

    @jax.jit
    def topk_int(keys):
        kt, pos = jax.lax.top_k(keys.T, K)  # [B, K] int32 keys
        local = kt & idx_mask
        s = jax.lax.bitcast_convert_type(kt & ~idx_mask, jnp.float32)
        s = jnp.where(kt < 0, -jnp.inf, s)
        ids = (pos // kb) * row_block + local
        return ids, s

    t, (ids_i, s_i) = timeit(topk_int, keys)
    out["topk_int_ms"] = round(t * 1e3, 2)
    # ids can differ on exact score ties (int keys keep the id-splice
    # bits as tie-breaker); the masked SCORES must match exactly
    out["topk_int_matches"] = bool(
        np.array_equal(np.sort(np.asarray(s_i), 1),
                       np.sort(np.asarray(s_f), 1)))

    @jax.jit
    def topk_approx(keys):
        local = keys & idx_mask
        scores = jax.lax.bitcast_convert_type(keys & ~idx_mask,
                                              jnp.float32)
        scores = jnp.where(keys < 0, -jnp.inf, scores)
        block_id = (jnp.arange(m, dtype=jnp.int32) // kb)[:, None]
        gids = block_id * row_block + local
        s, pos = jax.lax.approx_max_k(scores.T, K, recall_target=0.99)
        ids = jnp.take_along_axis(gids.T, pos, axis=1)
        return ids, s

    t, (ids_a, _) = timeit(topk_approx, keys)
    out["topk_approx_ms"] = round(t * 1e3, 2)
    inter = [np.intersect1d(np.asarray(ids_a)[i], np.asarray(ids_f)[i])
             .size for i in range(0, B, 97)]
    out["approx_recall"] = round(float(np.mean(inter)) / K, 4)

    best_s = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    best_i = jnp.zeros((B, K), jnp.int32)

    @jax.jit
    def merge(bs, bi, s, ids):
        cs = jnp.concatenate([bs, s], axis=1)
        ci = jnp.concatenate([bi, ids], axis=1)
        s2, sel = jax.lax.top_k(cs, K)
        return s2, jnp.take_along_axis(ci, sel, axis=1)

    t, _ = timeit(merge, best_s, best_i, s_f, ids_f)
    out["merge_ms"] = round(t * 1e3, 2)

    @jax.jit
    def block_iter(cols, nnz, q):
        return bp.bitpack_blockwise_topk(q, cols, nnz, V, K,
                                         block_rows=BLOCK,
                                         selection="bucketed")

    t, _ = timeit(block_iter, cols, nnz, q, iters=4)
    out["block_iter_ms"] = round(t * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
