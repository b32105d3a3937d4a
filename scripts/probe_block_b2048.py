"""Block-tier knob sweep at 21M: B=2048 (pack amortization) and
bucket=32 (merge halving) on the int8 selection path.

The int8 quantized q operand is HALF the bf16 one (q8T [VP, B] int8),
which makes B=2048 fit the kernel's VMEM budget where bf16 could not
(64 MB vs 128 MB for the query block alone). Per-block pack (~23 ms)
and merge are B-independent / sub-linear, so larger B approaches the
pure-scoring roofline. QPS-only (recall 1.0 at these settings is
attested in docs/probe_stream_21m_stage_c_r5.json; the bucket=32 run
re-checks recall on 4 queries since collisions double).

Run alone on the TPU:
    env -u JAX_PLATFORMS python scripts/probe_block_b2048.py [--rows N]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vsearch_tpu.utils.claim_guard import register_tpu_process

register_tpu_process("probe_block_b2048")
from vsearch_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from probe_stream import (WIKI21M, make_host_ell,  # noqa: E402
                          make_queries)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=WIKI21M)
    args = ap.parse_args()

    import jax

    from vsearch_tpu.index import BoTIndex
    from vsearch_tpu.ops.bitpack import bitpack_blockwise_topk
    from vsearch_tpu.ops.ell import ELLMatrix

    k = 100
    out = {"rows": args.rows, "device": str(jax.devices()[0])}
    cols, nnz = make_host_ell(args.rows, seed=2)

    idx = BoTIndex()
    idx.set_ell(ELLMatrix(cols=cols, nnz=nnz, vals=None, num_cols=30522,
                          sentinel_padded=False),
                host_cache=(cols, nnz))
    cols_d, nnz_d = idx._get_block_ell()
    jax.block_until_ready(cols_d)

    def run(tag, b, bucket):
        q = make_queries(b, seed=3)
        fn = jax.jit(lambda qq, c, z: bitpack_blockwise_topk(
            qq, c, z, num_cols=30522, k=k,
            block_rows=idx.stream_block_rows,
            selection="bucketed_int8", bucket=bucket))
        try:
            r = fn(q, cols_d, nnz_d)
            np.asarray(r[0][:1])
        except Exception as exc:
            out[f"{tag}_error"] = f"{type(exc).__name__}: {exc}"[:200]
            print(json.dumps({tag: out[f"{tag}_error"]}), flush=True)
            return None
        t0 = time.perf_counter()
        r = fn(q, cols_d, nnz_d)
        np.asarray(r[0][:1])
        dt = time.perf_counter() - t0
        out[f"{tag}_qps"] = round(b / dt, 1)
        out[f"{tag}_sweep_s"] = round(dt, 2)
        print(json.dumps({tag: out[f"{tag}_qps"]}), flush=True)
        return np.asarray(r[0])

    run("b1024_bkt16", 1024, 16)   # shipped default, cross-check
    run("b2048_bkt16", 2048, 16)
    ids32 = run("b1024_bkt32", 1024, 32)
    run("b2048_bkt32", 2048, 32)

    if ids32 is not None:
        # recall spot-check for bucket=32 (4 queries vs host-exact)
        from probe_stream import host_exact_scores
        q4 = make_queries(4, seed=3)
        recalls = []
        for i in range(4):
            ex = host_exact_scores(q4[i], cols, nnz)
            kth = -np.partition(-ex, k - 1)[k - 1]
            tol = 1e-2 * max(kth, 1.0)
            recalls.append(float((ex[ids32[i]] >= kth - tol).mean()))
        out["b1024_bkt32_recall"] = round(float(np.mean(recalls)), 4)

    print(json.dumps(out), flush=True)
    with open("docs/probe_block_b2048.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
