"""Alpha-at-scale sweep: candidate budget x selection variant
(VERDICT r4 items 4 and 7).

The large real-valued sparse path (binary-support proxy + exact gather
rerank, ops/two_stage.binary_proxy_search) serves recall 0.97 at C=1024
/ 667 QPS on the 2M-row synthetic index; the exact-CSR behavior being
matched (reference: src/ir/retriever/index.py:88-94) is recall 1.0.
Target: a point with recall >= 0.99 at >= 500 QPS. This probe measures,
on the SAME index and query set bench.py uses:

  - QPS + recall for C in {1024, 1536, 2048}
  - candidate selection by exact lax.top_k vs approx_max_k (candidates
    feed an exact rerank, so approximate selection only perturbs the
    candidate SET, not the final ordering)
  - stage timing split (proxy+selection vs rerank gather)

The JL-sketch A/B this probe once carried (--sketch-only) settled the
earn-or-delete question: d=1024 sketch selection measured recall 0.015
(C=1024) / 0.023 (C=2048) vs 0.97-0.995 for the support proxy on the
same index and queries (rows preserved in docs/probe_alpha_sweep.json)
— the JL path was deleted from ops/ after that run, as predicted by
its variance ||q||^2||p||^2/d being large against the score spread.

Run alone on the TPU:
    env -u JAX_PLATFORMS python scripts/probe_alpha_sweep.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vsearch_tpu.utils.claim_guard import register_tpu_process

register_tpu_process("probe_alpha_sweep")
from vsearch_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vsearch_tpu.ops.bitpack import (BUCKET, bitpack_bucketed_topk,  # noqa: E402
                                     pack_ell_device)
from vsearch_tpu.ops.ell import ELLMatrix, ell_matvec_chunked  # noqa: E402
from vsearch_tpu.ops.two_stage import exact_rerank  # noqa: E402

N = 2_000_000
V = 29523
NNZ = 64
K = 100
B = 128
NCHUNKS = 8  # 1024 queries total
NRQ = 32  # ground-truth query subset: top_k over [B, 2M] fp32 scores
#           (1 GB + sort workspace) next to the ~7.4 GB proxy stalls the
#           chip; bench.py uses 8, we use 32 for tighter recall CIs


def _log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _force(r):
    x = r[0] if isinstance(r, tuple) else r
    np.asarray(jnp.sum(x[:8].astype(jnp.int32)))


def timeit(fn, *args, iters=NCHUNKS):
    r = fn(*args)
    _force(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _force(r)
    return (time.perf_counter() - t0) / iters, r


def main():
    out = {"n": N, "v": V, "nnz": NNZ, "k": K, "b": B}

    # same synthetic 2M-row real-valued ELL as bench.py's alpha section
    n_pad = -(-N // 65536) * 65536

    @jax.jit
    def gen_ell(key):
        k1, k2 = jax.random.split(key)
        cols = jax.random.randint(k1, (n_pad, NNZ), 0, V, dtype=jnp.int32)
        vals = 0.5 + jax.random.uniform(k2, (n_pad, NNZ))
        row = jnp.arange(n_pad)
        real = (row < N)[:, None]
        # sentinel-padded: pad rows carry col V / val 0, which every
        # consumer (pack, matvec, rerank) treats as inert
        return (jnp.where(real, cols, V),
                jnp.where(real, NNZ, 0).astype(jnp.int32)[:, 0],
                jnp.where(real, vals, 0.0).astype(jnp.bfloat16))

    cols_d, nnz_d, vals_d = gen_ell(jax.random.PRNGKey(3))
    ell = ELLMatrix(cols=cols_d, nnz=nnz_d, vals=vals_d, num_cols=V,
                    sentinel_padded=True)
    _log("ELL generated, packing proxy...")
    proxy = pack_ell_device(ell)
    jax.block_until_ready(proxy.words)
    _log("proxy packed")

    rng = np.random.default_rng(1)
    q = np.zeros((B, V), dtype=np.float32)
    for i in range(B):
        active = rng.choice(V, size=768, replace=False)
        q[i, active] = rng.random(768).astype(np.float32)
    qd = jnp.asarray(q)

    # exact ground truth over the weighted ELL — NRQ queries only, and
    # every large array passed as a jit ARGUMENT: closing over the 2M-row
    # ELL/proxy embeds them as HLO constants, and the axon remote-compile
    # tunnel rejects the resulting module (HTTP 413)
    @jax.jit
    def exact_kth(qd, e):
        sc = ell_matvec_chunked(qd[:NRQ], e, chunk_rows=65536)
        return jax.lax.top_k(sc, K)[0][:, -1]

    kth = np.asarray(exact_kth(qd, ell))
    tol = 1e-3 * np.maximum(kth, 1.0)
    _log("exact ground truth done")

    @jax.jit
    def got_scores(qd, e, ids):
        sc = ell_matvec_chunked(qd[:NRQ], e, chunk_rows=65536)
        return jnp.take_along_axis(sc, ids, axis=1)

    def recall_of(ids):
        got = np.asarray(got_scores(qd, ell, jnp.asarray(ids[:NRQ])))
        return float(np.mean(got >= (kth - tol)[:, None]))

    rows = []
    for c in (1024, 1536, 2048):
        for sel in ("exact", "approx"):
            def full(qx, e, bmx, c=c, sel=sel):
                cand, _ = bitpack_bucketed_topk(
                    qx, bmx, k=c, approx_final=(sel == "approx"))
                return exact_rerank(qx, e, cand, K)

            def stage1(qx, bmx, c=c, sel=sel):
                return bitpack_bucketed_topk(
                    qx, bmx, k=c, approx_final=(sel == "approx"))

            ffull = jax.jit(full)
            f1 = jax.jit(stage1)
            _log(f"compiling/timing c={c} sel={sel}...")
            t_full, r = timeit(ffull, qd, ell, proxy)
            t_1, _ = timeit(f1, qd, proxy)
            rec = recall_of(np.asarray(r[0]))
            rows.append({"path": "bitproxy", "c": c, "sel": sel,
                         "qps": round(B / t_full, 1),
                         "recall": round(rec, 4),
                         "stage1_ms": round(t_1 * 1e3, 1),
                         "rerank_ms": round((t_full - t_1) * 1e3, 1)})
            print(json.dumps(rows[-1]), flush=True)

    out["rows"] = rows
    out["device"] = str(jax.devices()[0])
    with open("docs/probe_alpha_sweep.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/probe_alpha_sweep.json")


if __name__ == "__main__":
    main()
