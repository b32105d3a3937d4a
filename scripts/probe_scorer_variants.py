"""Bit-plane scorer kernel variants: close the VPU-extraction gap.

The fused bucketed scorer runs at ~166-181 TF/s effective (42-46% of
v5e's 394 TF/s bf16 peak). Cost model from measured numbers (2M rows,
B=1024, VP=32768): MXU work is ~174 us/program but the kernel takes
~395 us — the difference matches the VPU bit-plane extraction
(shift, and, int->bf16 convert per plane) running serialized against
the MXU dots. This probe times variants of the extraction on the real
chip, output kept tiny (bucketed keys) so HBM writeback doesn't mask
kernel time:

  v0_current   - shipped kernel (per-plane shift/and/convert, K=128)
  v1_pair      - TWO planes per (shift, and, shift): bits p and p+16
                 land at bf16-exponent positions 14 and 30, so the
                 uint32 bitcasts to a PAIR of bf16 lanes with values
                 {0, 2.0} (2.0 == 0x4000 is a single-bit pattern; the
                 0.5 folds into the query operand). One K=256 dot per
                 pair -> half the acc updates, ~2.7x fewer VPU ops.
  v2_twoacc    - v0 with two alternating accumulators (tests whether
                 breaking the acc dependency chain lets Mosaic overlap
                 VPU extraction with MXU dots)
  v1_twoacc    - both together

Run alone on the TPU:
    env -u JAX_PLATFORMS python scripts/probe_scorer_variants.py
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vsearch_tpu.utils.claim_guard import register_tpu_process

register_tpu_process("probe_scorer")
from vsearch_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from vsearch_tpu.ops import bitpack as bp  # noqa: E402

N = 2_000_000
V = 30522
B = 1024
BUCKET = 8
ROW_BLOCK = 1024
LANES = 128
TILE_BITS = 4096
K = 100


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


def acc_v0(bits_ref, q_ref, num_ktiles, row_block, b, num_cols,
           twoacc=False):
    accs = [jnp.zeros((row_block, b), jnp.float32)
            for _ in range(2 if twoacc else 1)]
    i = 0
    for kt in range(num_ktiles):
        words = bits_ref[:, kt * LANES:(kt + 1) * LANES]
        for p in range(32):
            lo = kt * TILE_BITS + p * LANES
            if lo >= num_cols:
                continue
            plane = ((words >> np.uint32(p)) & np.uint32(1)
                     ).astype(jnp.int32).astype(jnp.bfloat16)
            qblk = q_ref[lo: lo + LANES, :]
            accs[i % len(accs)] = accs[i % len(accs)] + jnp.dot(
                plane, qblk, preferred_element_type=jnp.float32)
            i += 1
    return sum(accs) if twoacc else accs[0]


def acc_v1(bits_ref, q_ref, num_ktiles, row_block, b, num_cols,
           twoacc=False):
    """Pair extraction. q_ref here is the INTERLEAVED operand: position
    kt*4096 + j*256 + lane*2 + half corresponds to vocab bit
    kt*4096 + (j + 16*half)*128 + lane, values pre-scaled by 0.5."""
    accs = [jnp.zeros((row_block, b), jnp.float32)
            for _ in range(2 if twoacc else 1)]
    i = 0
    for kt in range(num_ktiles):
        words = bits_ref[:, kt * LANES:(kt + 1) * LANES]
        for j in range(16):
            # planes j and j+16 -> bf16 pair {0, 2.0} per uint32
            t = ((words >> np.uint32(j)) & np.uint32(0x10001)
                 ) << np.uint32(14)
            pair = jax.lax.bitcast_convert_type(t, jnp.bfloat16)
            pair = pair.reshape(row_block, 2 * LANES)
            qblk = q_ref[kt * TILE_BITS + j * 2 * LANES:
                         kt * TILE_BITS + (j + 1) * 2 * LANES, :]
            accs[i % len(accs)] = accs[i % len(accs)] + jnp.dot(
                pair, qblk, preferred_element_type=jnp.float32)
            i += 1
    return sum(accs) if twoacc else accs[0]


def make_bucketed(acc_fn, num_ktiles, row_block, b, num_cols, num_rows,
                  bucket):
    idx_mask = row_block - 1
    kb = row_block // bucket

    def kernel(bits_ref, q_ref, keys_ref):
        acc = acc_fn(bits_ref, q_ref, num_ktiles, row_block, b,
                     num_cols)
        acc = jnp.maximum(acc, 0.0)
        keys = jax.lax.bitcast_convert_type(acc, jnp.int32)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (row_block, b), 0)
        keys = (keys & jnp.int32(~idx_mask)) | row_ids
        gid = pl.program_id(0) * row_block + row_ids
        keys = jnp.where(gid < num_rows, keys, jnp.int32(-(2 ** 31)))
        size = row_block
        while size > kb:
            half = size // 2
            keys = jnp.maximum(keys[:half], keys[half:size])
            size = half
        keys_ref[:] = keys

    return kernel


def interleave_queries(qT):
    """[VP, B] plane-order -> pair-interleaved order for acc_v1,
    pre-scaled by 0.5 (pair values are {0, 2.0})."""
    vp, b = qT.shape
    nkt = vp // TILE_BITS
    x = qT.reshape(nkt, 2, 16, LANES, b)     # [kt, half, j, lane, b]
    x = x.transpose(0, 2, 3, 1, 4)           # [kt, j, lane, half, b]
    return (x.reshape(vp, b) * 0.5).astype(jnp.bfloat16)


def run_variant(name, acc_fn, words, qT, interleaved, twoacc):
    n_pad = words.shape[0]
    m = n_pad // BUCKET
    fn_acc = functools.partial(acc_fn, twoacc=twoacc)
    kernel = make_bucketed(fn_acc, qT.shape[0] // TILE_BITS, ROW_BLOCK,
                           B, V, N, BUCKET)
    q_in = interleave_queries(qT) if interleaved else qT

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, B), jnp.int32),
        grid=(n_pad // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, words.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qT.shape[0], B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK // BUCKET, B),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    jf = jax.jit(lambda w, q: f(w, q))
    try:
        dt, r = timeit(jf, words, q_in)
    except Exception as exc:
        print(json.dumps({"variant": name,
                          "error": f"{type(exc).__name__}: {exc}"
                          [:300]}), flush=True)
        return None, None
    flops = 2.0 * B * n_pad * qT.shape[0]
    row = {"variant": name, "ms": round(dt * 1e3, 2),
           "tflops": round(flops / dt / 1e12, 1),
           "qps_equiv": round(B / dt, 1)}
    print(json.dumps(row), flush=True)
    return row, r


def main():
    vp = -(-V // TILE_BITS) * TILE_BITS
    nw = vp // 32
    n_pad = -(-N // ROW_BLOCK) * ROW_BLOCK

    # synthetic random bits, same recipe as bench.py's scale section
    chunk = 262_144
    n_cpad = -(-n_pad // chunk) * chunk
    last_tile = vp // TILE_BITS - 1
    keep = 0
    for p in range(32):
        if last_tile * TILE_BITS + p * LANES < V:
            keep |= 1 << p

    @functools.partial(jax.jit, donate_argnums=0)
    def fill(buf, key):
        def body(i, carry):
            buf, key = carry
            k1, k2, k3 = jax.random.split(jax.random.fold_in(key, i), 3)
            a = jax.random.bits(k1, (chunk, nw), jnp.uint32)
            bb = jax.random.bits(k2, (chunk, nw), jnp.uint32)
            c = jax.random.bits(k3, (chunk, nw), jnp.uint32)
            w = (a & bb & c & (a >> 1) & (bb >> 2) & (c >> 3)
                 & (a >> 5) & (bb >> 7))
            col = jnp.arange(nw, dtype=jnp.int32)
            w = jnp.where((col >= last_tile * 128)[None, :],
                          w & jnp.uint32(keep), w)
            return jax.lax.dynamic_update_slice(
                buf, w, (i * chunk, 0)), key

        return jax.lax.fori_loop(0, n_cpad // chunk, body,
                                 (buf, key))[0]

    # keep the chunk-padded buffer unsliced (a [:n_pad] slice would
    # copy ~8 GB while the original is live -> OOM); rows past
    # num_rows=N are masked out by the bucketed kernel
    print(f"[{time.strftime('%H:%M:%S')}] filling {n_cpad}x{nw} words...",
          flush=True)
    words = fill(jnp.zeros((n_cpad, nw), jnp.uint32),
                 jax.random.PRNGKey(0))
    jax.block_until_ready(words)
    print(f"[{time.strftime('%H:%M:%S')}] fill done", flush=True)

    rng = np.random.default_rng(1)
    q = np.zeros((B, V), dtype=np.float32)
    for i in range(B):
        active = rng.choice(V, size=768, replace=False)
        q[i, active] = rng.random(768).astype(np.float32)
    qT = jnp.asarray(
        np.pad(q.T, ((0, vp - V), (0, 0))).astype(np.float32)
    ).astype(jnp.bfloat16)

    jax.block_until_ready(qT)
    print(f"[{time.strftime('%H:%M:%S')}] queries staged, "
          "compiling v0...", flush=True)
    rows = []
    results = {}
    for name, fn, inter, two in (
            ("v0_current", acc_v0, False, False),
            ("v1_pair", acc_v1, True, False),
            ("v2_twoacc", acc_v0, False, True),
            ("v1_twoacc", acc_v1, True, True)):
        print(f"[{time.strftime('%H:%M:%S')}] variant {name}...",
              flush=True)
        row, r = run_variant(name, fn, words, qT, inter, two)
        if row:
            rows.append(row)
            results[name] = np.asarray(r[:1024])

    # correctness: every variant must produce identical keys to v0
    if "v0_current" in results:
        ref = results["v0_current"]
        for name, got in results.items():
            ok = bool(np.array_equal(ref, got))
            # score quantization: key splice keeps ids in low bits; the
            # pair trick scales by 0.5*2.0 == exactly 1.0, so keys must
            # match BIT-exactly when the accumulation order effects are
            # nil (binary ops) — report mismatch rate otherwise
            mism = float(np.mean(ref != got))
            print(json.dumps({"check": name, "equal": ok,
                              "mismatch_frac": round(mism, 6)}),
                  flush=True)

    with open("docs/probe_scorer_variants.json", "w") as f:
        json.dump({"n": N, "b": B, "v": V, "rows": rows,
                   "device": str(jax.devices()[0])}, f, indent=1)
    print("wrote docs/probe_scorer_variants.json")


if __name__ == "__main__":
    main()
