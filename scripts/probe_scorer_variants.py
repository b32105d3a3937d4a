"""Bit-plane scorer kernel variants — RESULT: v0 is at the roofline.

Measured (docs/probe_scorer_variants.json, 2M rows x B=1024, v5e):
v0 200.2 TF/s == v2 200.3 (two accumulators change nothing: Mosaic
already overlaps the VPU extraction with the MXU dots), v3 188.9
(transposed pair-extraction halves VPU work but its contracting-dim-0
dot is slightly slower). The v5e bf16 MXU peak is ~197 TF/s — the
394 number that motivated this probe is the INT8 peak. v0 therefore
runs at ~100% of the bf16 roofline (~95% counting only the 30522/32768
non-padding columns); there is no 2x in the scorer, and block-tier
headroom math must use 197, not 394. Kept for re-probing on toolchain
bumps.

Variants timed on the real chip, output kept tiny (bucketed keys) so
HBM writeback doesn't mask kernel time:

  v0_current   - shipped kernel (per-plane shift/and/convert, 32
                 planes x 4 VPU ops per word-tile)
  v2_twoacc    - v0 with two alternating accumulators (tests whether
                 breaking the acc dependency chain lets Mosaic overlap
                 VPU extraction with MXU dots)
  v3_transpose - TRANSPOSED words layout (words_T [nw, R]: word rows,
                 index-row lanes). One (shift, and, shift, bitcast)
                 extracts TWO planes j and j+16: pltpu.bitcast
                 uint32->bf16 doubles the SUBLANE dim (low half ->
                 row 2w, high half -> row 2w+1, measured by
                 scripts/probe_bitcast_layout.py), which in this
                 orientation is the CONTRACTION dim — each plane row
                 meets its own query row. 16 pairs x 4 ops vs v0's
                 32 planes x 4 ops => ~2x fewer VPU ops, identical
                 MXU work (dot_general contracting dim 0 of both).
  v3_twoacc    - v3 + alternating accumulators

A NxB=4096x128 numpy cross-check validates v3's decoded bucket-max
scores/ids before the 2M timing run.

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

N = 2_000_000
V = 30522
B = 1024
BUCKET = 8
ROW_BLOCK = 1024
LANES = 128
TILE_BITS = 4096
K = 100


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


# ---------------------------------------------------------------- row-major
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


def run_rowmajor(name, words, qT, twoacc, n_rows):
    n_pad = words.shape[0]
    m = n_pad // BUCKET
    fn_acc = functools.partial(acc_v0, twoacc=twoacc)
    kernel = make_bucketed(fn_acc, qT.shape[0] // TILE_BITS, ROW_BLOCK,
                           B, V, n_rows, BUCKET)
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
    return emit(name, jax.jit(lambda w, q: f(w, q)), words, qT, n_pad)


# --------------------------------------------------------------- transposed
def acc_v3(wt_ref, q2_ref, num_ktiles, row_block, b, num_cols,
           twoacc=False):
    """words_T tile [LANES, row_block] per kt; extraction yields the
    [2*LANES, row_block] plane-pair block whose SUBLANES are the
    contraction dim (vocab), met row-for-row by q2's pair order."""
    accs = [jnp.zeros((row_block, b), jnp.float32)
            for _ in range(2 if twoacc else 1)]
    i = 0
    for kt in range(num_ktiles):
        wt = wt_ref[kt * LANES:(kt + 1) * LANES, :]  # [LANES, RB]
        for j in range(16):
            lo = kt * TILE_BITS + j * LANES
            if lo >= num_cols:
                continue
            t = ((wt >> np.uint32(j)) & np.uint32(0x10001)
                 ) << np.uint32(14)
            pair = pltpu.bitcast(t, jnp.bfloat16)  # [2*LANES, RB]
            q2blk = q2_ref[(kt * 16 + j) * 2 * LANES:
                           (kt * 16 + j + 1) * 2 * LANES, :]
            # contract dim 0 of both: acc[r, b] += pair[c, r] q2[c, b]
            # (pair values are {0, 2.0}; q2 is pre-scaled by 0.5)
            accs[i % len(accs)] = accs[i % len(accs)] + (
                jax.lax.dot_general(
                    pair, q2blk, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            i += 1
    return sum(accs) if twoacc else accs[0]


def run_transposed(name, words_t, q2, twoacc, n_rows, bucket=BUCKET,
                   row_block=ROW_BLOCK):
    n_pad = words_t.shape[1]
    nw = words_t.shape[0]
    m = n_pad // bucket
    fn_acc = functools.partial(acc_v3, twoacc=twoacc)
    kernel = make_bucketed(fn_acc, nw // LANES, row_block,
                           q2.shape[1], V, n_rows, bucket)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, q2.shape[1]), jnp.int32),
        grid=(n_pad // row_block,),
        in_specs=[
            pl.BlockSpec((nw, row_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q2.shape[0], q2.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block // bucket, q2.shape[1]),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return emit(name, jax.jit(lambda w, q: f(w, q)), words_t, q2, n_pad)


def emit(name, jf, a0, a1, n_pad):
    try:
        dt, r = timeit(jf, a0, a1)
    except Exception as exc:
        print(json.dumps({"variant": name,
                          "error": f"{type(exc).__name__}: {exc}"
                          [:300]}), flush=True)
        return None, None
    vp = TILE_BITS * (-(-V // TILE_BITS))
    flops = 2.0 * B * n_pad * vp
    row = {"variant": name, "ms": round(dt * 1e3, 2),
           "tflops": round(flops / dt / 1e12, 1),
           "qps_equiv": round(B / dt, 1)}
    print(json.dumps(row), flush=True)
    return row, r


def pair_interleave_rows(vp):
    """perm[k] = vocab row of q2 row k (see acc_v3 mapping)."""
    perm = np.empty(vp, np.int64)
    nkt = vp // TILE_BITS
    k = 0
    for kt in range(nkt):
        for j in range(16):
            for w in range(LANES):
                for h in (0, 1):
                    perm[k] = kt * TILE_BITS + (j + 16 * h) * LANES + w
                    k += 1
    return perm


def correctness_check(qT):
    """v3 vs numpy dense reference at N=4096, bucket=1 (ids == iota, so
    decoded bucket scores are directly comparable)."""
    n_small = 4096
    vp = qT.shape[0]
    nw = vp // 32
    rng = np.random.default_rng(7)
    dense = (rng.random((n_small, V)) < 0.01)
    wt = np.zeros((nw, n_small), np.uint32)
    # pack: vocab c=kt*4096+p*128+w -> words_T[kt*128+w] bit p
    cols = np.arange(V)
    kt = cols // TILE_BITS
    p = (cols % TILE_BITS) // LANES
    w = cols % LANES
    for c in range(V):
        rows_set = np.nonzero(dense[:, c])[0]
        wt[kt[c] * LANES + w[c], rows_set] |= np.uint32(1) << np.uint32(
            p[c])
    q2 = np.asarray(qT, np.float32)[pair_interleave_rows(vp)] * 0.5
    q2 = jnp.asarray(q2[:, :128]).astype(jnp.bfloat16)  # B=128 slice
    row, r = run_transposed("v3_check", jnp.asarray(wt), q2,
                            twoacc=False, n_rows=n_small, bucket=1,
                            row_block=1024)
    if r is None:
        return False
    keys = np.asarray(r)  # [n_small, 128]
    got = (keys & ~np.int32(1023)).view(np.float32)
    ref = dense.astype(np.float32) @ np.asarray(
        qT[:V, :128], np.float32)
    ref = np.maximum(ref, 0.0)
    # key splice zeroes the low 10 mantissa bits; compare at that
    # granularity plus bf16 dot rounding
    ok = np.allclose(got, ref, rtol=3e-2, atol=1e-2)
    err = float(np.max(np.abs(got - ref) / np.maximum(ref, 1.0)))
    print(json.dumps({"check": "v3_vs_numpy", "ok": bool(ok),
                      "max_rel_err": round(err, 5)}), flush=True)
    return ok


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

    rng = np.random.default_rng(1)
    q = np.zeros((B, V), dtype=np.float32)
    for i in range(B):
        active = rng.choice(V, size=768, replace=False)
        q[i, active] = rng.random(768).astype(np.float32)
    qT = jnp.asarray(
        np.pad(q.T, ((0, vp - V), (0, 0))).astype(np.float32)
    ).astype(jnp.bfloat16)
    jax.block_until_ready(qT)

    _log("correctness check (v3 vs numpy, N=4096)...")
    correctness_check(qT)

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

    rows = []
    results = {}
    _log(f"filling {n_cpad}x{nw} words (row-major)...")
    words = fill(jnp.zeros((n_cpad, nw), jnp.uint32),
                 jax.random.PRNGKey(0))
    jax.block_until_ready(words)
    _log("fill done; timing row-major variants")
    for name, two in (("v0_current", False), ("v2_twoacc", True)):
        _log(f"variant {name}...")
        row, r = run_rowmajor(name, words, qT, two, N)
        if row:
            rows.append(row)
            results[name] = np.asarray(r[:1024])
    if "v0_current" in results and "v2_twoacc" in results:
        mism = float(np.mean(results["v0_current"]
                             != results["v2_twoacc"]))
        print(json.dumps({"check": "v2_vs_v0",
                          "mismatch_frac": round(mism, 6)}),
              flush=True)
    del words, results

    # transposed fill: same per-bit distribution, [nw, n] layout.
    # bits are planes in both layouts so the same keep-mask applies,
    # keyed by word ROW here.
    @functools.partial(jax.jit, donate_argnums=0)
    def fill_t(buf, key):
        def body(i, carry):
            buf, key = carry
            k1, k2, k3 = jax.random.split(jax.random.fold_in(key, i), 3)
            a = jax.random.bits(k1, (nw, chunk), jnp.uint32)
            bb = jax.random.bits(k2, (nw, chunk), jnp.uint32)
            c = jax.random.bits(k3, (nw, chunk), jnp.uint32)
            w = (a & bb & c & (a >> 1) & (bb >> 2) & (c >> 3)
                 & (a >> 5) & (bb >> 7))
            rw = jnp.arange(nw, dtype=jnp.int32)
            w = jnp.where((rw >= last_tile * 128)[:, None],
                          w & jnp.uint32(keep), w)
            return jax.lax.dynamic_update_slice(
                buf, w, (0, i * chunk)), key

        return jax.lax.fori_loop(0, n_cpad // chunk, body,
                                 (buf, key))[0]

    _log(f"filling {nw}x{n_cpad} words (transposed)...")
    words_t = fill_t(jnp.zeros((nw, n_cpad), jnp.uint32),
                     jax.random.PRNGKey(0))
    jax.block_until_ready(words_t)
    q2 = jnp.asarray(np.asarray(qT, np.float32)[
        pair_interleave_rows(vp)] * 0.5).astype(jnp.bfloat16)
    jax.block_until_ready(q2)
    _log("fill done; timing transposed variants")
    for name, two in (("v3_transpose", False), ("v3_twoacc", True)):
        _log(f"variant {name}...")
        row, _ = run_transposed(name, words_t, q2, two, N)
        if row:
            rows.append(row)

    with open("docs/probe_scorer_variants.json", "w") as f:
        json.dump({"n": N, "b": B, "v": V, "rows": rows,
                   "device": str(jax.devices()[0])}, f, indent=1)
    print("wrote docs/probe_scorer_variants.json")


if __name__ == "__main__":
    main()
