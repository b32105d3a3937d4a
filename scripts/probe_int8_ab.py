"""On-chip A/B of the fused int8 head (ops/int8_head.py) vs the bf16
vocab-chunked head at serving shapes.

Decision rule (VERDICT round 3, item 2): keep --int8_head only if it
delivers >= 1.15x embed throughput at <= 0.5% relative score error;
otherwise delete the kernel and the flag.

Run alone on the TPU (single-claim tunnel):
    env -u JAX_PLATFORMS python scripts/probe_int8_ab.py
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vsearch_tpu.models.bert import BertConfig
from vsearch_tpu.models.vdr import VDREncoderConfig, VDRModule


def bench_forward(module, variables, ids, ttype, mask, iters=16):
    fwd = jax.jit(lambda v, i, t, m: module.apply(v, i, t, m))
    r = fwd(variables, ids, ttype, mask)
    jax.block_until_ready(r)
    float(jnp.sum(r))  # force through the tunnel's async queue
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fwd(variables, ids, ttype, mask)
    float(jnp.sum(r))
    dt = (time.perf_counter() - t0) / iters
    return dt, r


def main():
    rng = np.random.default_rng(0)
    results = {}
    for b, l in ((256, 128), (32, 128)):
        cfg = VDREncoderConfig(bert=BertConfig(dtype=jnp.bfloat16),
                               max_len=l, shift_vocab_num=999, topk=768)
        base = VDRModule(cfg)
        ids = jnp.asarray(rng.integers(999, 30522, size=(b, l)), jnp.int32)
        ttype = jnp.zeros_like(ids)
        mask = jnp.ones_like(ids)
        variables = base.init(jax.random.PRNGKey(0), ids[:1, :8],
                              ttype[:1, :8], mask[:1, :8])

        dt_bf16, out_bf16 = bench_forward(base, variables, ids, ttype, mask)
        import dataclasses
        qmod = VDRModule(dataclasses.replace(cfg, int8_head=True))
        dt_int8, out_int8 = bench_forward(qmod, variables, ids, ttype, mask)

        a = np.asarray(out_bf16, np.float32)
        bq = np.asarray(out_int8, np.float32)
        denom = max(np.abs(a).max(), 1e-6)
        rel_err = float(np.abs(a - bq).max() / denom)
        speedup = dt_bf16 / dt_int8
        results[f"{b}x{l}"] = {
            "bf16_ms": round(dt_bf16 * 1e3, 2),
            "int8_ms": round(dt_int8 * 1e3, 2),
            "speedup": round(speedup, 3),
            "bf16_passages_per_s": round(b / dt_bf16, 1),
            "int8_passages_per_s": round(b / dt_int8, 1),
            "max_rel_err": round(rel_err, 5),
        }
        print(json.dumps({f"{b}x{l}": results[f"{b}x{l}"]}), flush=True)

    keep = all(r["speedup"] >= 1.15 and r["max_rel_err"] <= 0.005
               for r in results.values())
    print(json.dumps({"verdict": "KEEP" if keep else "DELETE",
                      "device": str(jax.devices()[0]),
                      "results": results}))


if __name__ == "__main__":
    from vsearch_tpu.utils.claim_guard import register_tpu_process
    register_tpu_process('probe_int8_ab')
    from vsearch_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402
    enable_compilation_cache()
    main()
