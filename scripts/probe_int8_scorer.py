"""Int8 MXU candidate-selection scorer for the block tier (r5).

The bf16 bucketed scorer is at its roofline (200 TF/s ~= v5e bf16 peak;
docs/probe_scorer_variants.json) — but v5e's INT8 MXU peak is ~394
TOPS, 2x bf16. Binary BoT scoring only needs exact scores for the FINAL
top-k; candidate SELECTION tolerates small score error when candidates
feed an exact rerank (the alpha bitproxy path already works this way).
This probe times an int8 variant of the fused bucketed kernel:

  plane extraction  (words >> p) & 1 -> int8   (VPU, same op count)
  dot               int8 x int8 -> int32       (MXU, 2x rate)
  key               (acc << SHIFT) | row_id    (acc <= nnz*127 < 2^21)

Queries are quantized per-query: qq = round(q * 127 / max(q)) — ranking
within a query is scale-invariant, so only rounding error (<= 1/254 of
the max weight per term) perturbs the candidate set. The probe measures
kernel time vs the shipped bf16 kernel at block shapes (262144 rows,
B=1024, bucket 16/32) and candidate recall of the true (exact bf16)
top-100 within the int8 top-C for C in {100, 200, 400}.

Run alone on the TPU:
    env -u JAX_PLATFORMS python scripts/probe_int8_scorer.py
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vsearch_tpu.utils.claim_guard import register_tpu_process

register_tpu_process("probe_int8_scorer")
from vsearch_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from vsearch_tpu.ops import bitpack as bp  # noqa: E402
from vsearch_tpu.ops.ell import ELLMatrix  # noqa: E402

V = 30522
NNZ_PAD = 128
BLOCK = 262144
B = 1024
K = 100
ROW_BLOCK = bp.ROW_BLOCK
LANES = bp.LANES
TILE_BITS = bp.TILE_BITS
PLANES = 32


def _log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _force(r):
    x = r[0] if isinstance(r, tuple) else r
    np.asarray(jnp.sum(x[:8].astype(jnp.int32)))


def timeit(fn, *args, iters=8):
    r = fn(*args)
    _force(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _force(r)
    return (time.perf_counter() - t0) / iters, r


def make_int8_kernel(num_ktiles, row_block, b, num_cols, num_rows,
                     bucket, shift):
    idx_mask = row_block - 1
    kb = row_block // bucket

    def kernel(bits_ref, q_ref, keys_ref):
        acc = jnp.zeros((row_block, b), jnp.int32)
        for kt in range(num_ktiles):
            words = bits_ref[:, kt * LANES:(kt + 1) * LANES]
            for p in range(PLANES):
                lo = kt * TILE_BITS + p * LANES
                if lo >= num_cols:
                    continue
                plane = ((words >> np.uint32(p)) & np.uint32(1)
                         ).astype(jnp.int8)
                qblk = q_ref[lo: lo + LANES, :]
                acc = acc + jnp.dot(plane, qblk,
                                    preferred_element_type=jnp.int32)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (row_block, b), 0)
        keys = (acc << shift) | row_ids
        gid = pl.program_id(0) * row_block + row_ids
        keys = jnp.where(gid < num_rows, keys, jnp.int32(-(2 ** 31)))
        size = row_block
        while size > kb:
            half = size // 2
            keys = jnp.maximum(keys[:half], keys[half:size])
            size = half
        keys_ref[:] = keys

    return kernel


def int8_keys_fn(words_shape, vp, bucket, num_rows, num_cols, shift=10):
    n_pad, w = words_shape
    kb = ROW_BLOCK // bucket
    m = n_pad // bucket
    kernel = make_int8_kernel(vp // TILE_BITS, ROW_BLOCK, B, num_cols,
                              num_rows, bucket, shift)

    @jax.jit
    def f(words, q8):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, B), jnp.int32),
            grid=(n_pad // ROW_BLOCK,),
            in_specs=[
                pl.BlockSpec((ROW_BLOCK, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((vp, B), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((kb, B), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(words, q8)

    return f


def quantize_queries(q, vp):
    """[B, V] f32 nonneg -> [VP, B] int8, per-query scale to 127."""
    mx = jnp.maximum(jnp.max(q, axis=1, keepdims=True), 1e-6)
    q8 = jnp.round(q * (127.0 / mx)).astype(jnp.int8)
    q8T = q8.T
    return jnp.pad(q8T, ((0, vp - q8T.shape[0]), (0, 0)))


def main():
    rng = np.random.default_rng(0)
    stride = V // NNZ_PAD
    r = rng.integers(0, stride, size=(BLOCK, NNZ_PAD), dtype=np.uint16)
    base = (np.arange(NNZ_PAD, dtype=np.uint16) * stride)[None, :]
    cols = jnp.asarray((r + base).astype(np.int32))
    nnz = jnp.asarray(rng.integers(48, 97, size=BLOCK).astype(np.int32))
    q = np.zeros((B, V), dtype=np.float32)
    for i in range(B):
        active = rng.choice(V, size=768, replace=False)
        q[i, active] = rng.random(768).astype(np.float32)
    qd = jnp.asarray(q)

    out = {"device": str(jax.devices()[0]), "block_rows": BLOCK, "b": B}

    pack = bp._pack_fn(BLOCK, NNZ_PAD, V, False)
    words = pack(cols, nnz)
    jax.block_until_ready(words)
    bm = bp.BitMatrix(words=words, num_rows=BLOCK, num_cols=V)
    vp = bm.padded_bits

    # shipped bf16 bucketed kernel at the blockwise bucket (16)
    qT = bp.prepare_queries(qd, bm)
    for bucket in (16, 32):
        f_bf16 = jax.jit(functools.partial(
            bp._bucketed_keys, bucket=bucket, row_block=ROW_BLOCK,
            interpret=False))
        _log(f"bf16 bucket={bucket}...")
        t, _ = timeit(lambda w, qq: f_bf16(qq, bp.BitMatrix(
            words=w, num_rows=BLOCK, num_cols=V)), words, qd)
        out[f"bf16_b{bucket}_ms"] = round(t * 1e3, 2)

    q8 = quantize_queries(qd, vp)
    jax.block_until_ready(q8)
    int8_keys = {}
    for bucket in (16, 32):
        _log(f"int8 bucket={bucket}...")
        f_i8 = int8_keys_fn(words.shape, vp, bucket, BLOCK, V)
        try:
            t, keys = timeit(f_i8, words, q8)
        except Exception as exc:
            out[f"int8_b{bucket}_error"] = f"{type(exc).__name__}: " \
                                           f"{exc}"[:300]
            continue
        out[f"int8_b{bucket}_ms"] = round(t * 1e3, 2)
        int8_keys[bucket] = keys
    flops = 2.0 * B * BLOCK * vp
    for key in ("bf16_b16_ms", "int8_b16_ms", "int8_b32_ms"):
        if key in out:
            out[key.replace("_ms", "_tfs")] = round(
                flops / (out[key] / 1e3) / 1e12, 1)

    if int8_keys:
        # candidate recall: exact bf16 top-100 found in int8 top-C
        _log("exact reference scores...")

        @jax.jit
        def exact_ids(qq, w):
            s = bp.bitpack_scores(qq, bp.BitMatrix(
                words=w, num_rows=BLOCK, num_cols=V))
            return jax.lax.top_k(s, K)[1]

        true_ids = np.asarray(exact_ids(qd, words))  # [B, K]
        kb = ROW_BLOCK // 16
        keys = int8_keys[16]

        @functools.partial(jax.jit, static_argnums=1)
        def cand_ids(keys, c):
            kt, pos = jax.lax.top_k(keys.T, c)
            local = kt & jnp.int32(ROW_BLOCK - 1)
            return (pos // kb) * ROW_BLOCK + local

        for c in (100, 200, 400):
            cids = np.asarray(cand_ids(keys, c))
            hit = [np.intersect1d(cids[i], true_ids[i]).size
                   for i in range(0, B, 31)]
            out[f"cand_recall_c{c}"] = round(
                float(np.mean(hit)) / K, 4)

    print(json.dumps(out), flush=True)
    with open("docs/probe_int8_scorer.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
