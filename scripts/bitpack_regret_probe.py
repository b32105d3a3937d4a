"""Regret/latency probe: selection variants across index sizes (TPU).

Reproduces the measured regret/latency table in docs/ARCHITECTURE.md
(source of the selection-policy decision). Usage:
  python scripts/bitpack_regret_probe.py 100000,1000000,2000000

For each N: time exact top_k, approx_max_k, fused bucketed (exact and
approx merge), and measure recall vs exact scores (score-tolerance, 8
queries). Prints one JSON line per (N, variant).
"""
import gc
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from vsearch_tpu.utils.claim_guard import register_tpu_process  # noqa: E402

register_tpu_process("bitpack_regret_probe")
from vsearch_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()
from vsearch_tpu.ops.bitpack import (ROW_BLOCK, BitMatrix,
                                     bitpack_bucketed_topk,
                                     bitpack_scores)

B, K, V = 128, 100, 29523
NUM_WORDS = 32768 // 32
SIZES = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                          else ["100000", "200000", "500000", "1000000",
                                "2000000", "3000000"])]

rng = np.random.default_rng(0)
q = np.zeros((B, V), dtype=np.float32)
for i in range(B):
    act = rng.choice(V, size=768, replace=False)
    q[i, act] = rng.random(768).astype(np.float32)
qd = jnp.asarray(q)

keep = np.uint32(0)
for p in range(32):
    if 7 * 4096 + p * 128 < V:
        keep |= np.uint32(1 << p)


def gen_words(n_pad):
    chunk = 262144

    @__import__('functools').partial(jax.jit, donate_argnums=0)
    def fill(buf, key):
        def body(i, carry):
            buf, key = carry
            kk = jax.random.fold_in(key, i)
            k1, k2, k3 = jax.random.split(kk, 3)
            a = jax.random.bits(k1, (chunk, NUM_WORDS), jnp.uint32)
            b_ = jax.random.bits(k2, (chunk, NUM_WORDS), jnp.uint32)
            c = jax.random.bits(k3, (chunk, NUM_WORDS), jnp.uint32)
            w = (a & b_ & c & (a >> 1) & (b_ >> 2) & (c >> 3)
                 & (a >> 5) & (b_ >> 7))
            col = jnp.arange(NUM_WORDS, dtype=jnp.int32)
            w = jnp.where((col >= 7 * 128)[None, :], w & keep, w)
            buf = jax.lax.dynamic_update_slice(buf, w, (i * chunk, 0))
            return buf, key

        buf, _ = jax.lax.fori_loop(0, n_pad // chunk, body, (buf, key))
        return buf

    n_chunks_pad = ((n_pad + chunk - 1) // chunk) * chunk
    buf = jnp.zeros((n_chunks_pad, NUM_WORDS), jnp.uint32)
    buf = fill(buf, jax.random.PRNGKey(0))
    return buf[:n_pad] if n_chunks_pad != n_pad else buf


def timeit(f, *args, reps=4):
    r = f(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(leaf[(0,) * leaf.ndim])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(leaf[(0,) * leaf.ndim])
    return (time.perf_counter() - t0) / reps, r


for N in SIZES:
    n_pad = ((N + ROW_BLOCK - 1) // ROW_BLOCK) * ROW_BLOCK
    words = gen_words(n_pad)
    bm = BitMatrix(words=words, num_rows=N, num_cols=V)

    # exact reference scores for 8 queries (host fetch ~64MB per 2M rows)
    sc8 = np.asarray(jax.jit(
        lambda q, bm: bitpack_scores(q, bm)[:8])(qd, bm))
    kth = np.sort(sc8, axis=1)[:, ::-1][:, K - 1]  # [8]

    def recall(ids):
        ids = np.asarray(ids)[:8]
        recs = []
        for i in range(8):
            tol = 1e-3 * max(kth[i], 1.0)
            recs.append(np.mean(sc8[i, ids[i]] >= kth[i] - tol))
        return float(np.mean(recs))

    variants = {
        "exact": jax.jit(lambda q, bm: jax.lax.top_k(
            bitpack_scores(q, bm), K)[::-1]),
        "approx": jax.jit(lambda q, bm: jax.lax.approx_max_k(
            bitpack_scores(q, bm), K, recall_target=0.97)[::-1]),
        "bucketed": jax.jit(lambda q, bm: bitpack_bucketed_topk(
            q, bm, k=K)),
        "bucketed_approx": jax.jit(lambda q, bm: bitpack_bucketed_topk(
            q, bm, k=K, approx_final=True, recall_target=0.95)),
        "bucketed_approx99": jax.jit(lambda q, bm: bitpack_bucketed_topk(
            q, bm, k=K, approx_final=True, recall_target=0.99)),
    }
    for name, fn in variants.items():
        try:
            dt, r = timeit(fn, qd, bm)
            rec = recall(r[0])
            print(json.dumps({"n": N, "variant": name,
                              "ms": round(dt * 1e3, 1),
                              "qps": round(B / dt, 0),
                              "recall": round(rec, 5)}), flush=True)
        except Exception as e:
            print(json.dumps({"n": N, "variant": name,
                              "error": f"{type(e).__name__}"}),
                  flush=True)
    del words, bm, sc8, variants
    gc.collect()
