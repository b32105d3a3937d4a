"""On-chip validation of the host-streamed >HBM search (VERDICT r3 #3).

Stage A (2M rows, fits HBM): streamed results must match the resident
bit-packed path on identical data; reports both QPS.
Stage B (wiki21m scale, 21,015,324 rows, ~86 GB packed — 5x HBM):
streamed search on one chip; reports sweep time, effective host->device
transfer rate, QPS at B=128 and B=1024, and recall vs host-exact
scoring for verification queries.

Run alone on the TPU:
    env -u JAX_PLATFORMS python scripts/probe_stream.py [--rows N]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

V = 30522
NNZ_PAD = 128
WIKI21M = 21_015_324


def make_host_ell(n, seed=0):
    """Synthetic wiki21m-shaped host ELL: nnz_pad 128, row nnz in
    [48, 96], UNIQUE cols per row (stratified: slot j draws from its
    own vocab stratum) so host-exact scoring needs no dedup."""
    rng = np.random.default_rng(seed)
    stride = V // NNZ_PAD  # 238
    r = rng.integers(0, stride, size=(n, NNZ_PAD), dtype=np.uint16)
    base = (np.arange(NNZ_PAD, dtype=np.uint16) * stride)[None, :]
    cols = r + base
    nnz = rng.integers(48, 97, size=n).astype(np.int32)
    return cols, nnz


def make_queries(b, seed=1):
    rng = np.random.default_rng(seed)
    q = np.zeros((b, V), dtype=np.float32)
    for i in range(b):
        active = rng.choice(V, size=768, replace=False)
        q[i, active] = rng.random(768).astype(np.float32)
    return q


def host_exact_scores(q_row, cols, nnz, chunk=2_000_000):
    """Exact f32 scores of one query over the host ELL (chunked)."""
    n = cols.shape[0]
    out = np.empty(n, dtype=np.float32)
    pos = np.arange(NNZ_PAD)[None, :]
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        g = q_row[cols[s:e].astype(np.int64)]
        g[pos >= nnz[s:e, None]] = 0.0
        out[s:e] = g.sum(axis=1, dtype=np.float32)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=WIKI21M)
    ap.add_argument("--skip-stage-a", action="store_true")
    ap.add_argument("--skip-stage-b", action="store_true",
                    help="skip the host-streaming sweeps (stage C, the "
                         "device-ELL block tier, still runs)")
    ap.add_argument("--block-rows", type=int, default=0,
                    help="override BoTIndex.stream_block_rows for "
                         "stage C (0 = class default); use to sweep "
                         "block sizes for the block tier")
    ap.add_argument("--b-list", type=str, default="128,1024",
                    help="comma-separated query batch sizes for the "
                         "stage B/C sweeps (per-block pack cost is "
                         "fixed, so larger B amortizes it)")
    args = ap.parse_args()
    b_list = tuple(int(x) for x in args.b_list.split(",") if x)

    from vsearch_tpu.utils.claim_guard import register_tpu_process

    register_tpu_process("probe_stream")
    from vsearch_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from vsearch_tpu.index.streamed import StreamedBitpackSearcher

    out = {"device": str(jax.devices()[0])}

    # ---- stage A: 2M rows, streamed vs resident ------------------------
    if not args.skip_stage_a:
        from vsearch_tpu.ops.bitpack import (bitpack_topk_search,
                                             pack_ell_device)
        from vsearch_tpu.ops.ell import ELLMatrix

        n_a = 2_000_000
        cols, nnz = make_host_ell(n_a, seed=0)
        q = make_queries(128)
        k = 100

        ell_dev = ELLMatrix(cols=jnp.asarray(cols, jnp.int32),
                            nnz=jnp.asarray(nnz), vals=None,
                            num_cols=V, sentinel_padded=False)
        bm = pack_ell_device(ell_dev)
        jax.block_until_ready(bm.words)
        # EXACT resident selection: the streamed path's default is
        # exact, so compare exact-vs-exact (the bucketed kernel's
        # selection is approximate and can drop borderline candidates)
        fn = jax.jit(lambda qq, b: bitpack_topk_search(qq, b, k=k))
        qd = jnp.asarray(q)
        r = fn(qd, bm)
        float(np.asarray(r[1])[0, 0])
        t0 = time.perf_counter()
        for _ in range(4):
            r = fn(qd, bm)
        float(np.asarray(r[1])[0, 0])
        resident_qps = 128 * 4 / (time.perf_counter() - t0)
        scores_resident = np.asarray(r[1])
        del bm, ell_dev, r
        import gc
        gc.collect()

        s = StreamedBitpackSearcher(cols, nnz, V, block_rows=1 << 18)
        ids_s, scores_s = s.search(q, k)  # includes compile
        t0 = time.perf_counter()
        ids_s, scores_s = s.search(q, k)
        stream_2m_s = time.perf_counter() - t0
        # same kernel, same bf16 scores — sorted score vectors must agree
        match = np.allclose(np.sort(scores_s, axis=1),
                            np.sort(scores_resident, axis=1),
                            rtol=1e-5, atol=1e-4)
        out["stage_a"] = {
            "rows": n_a, "resident_qps": round(resident_qps, 1),
            "stream_qps": round(128 / stream_2m_s, 1),
            "stream_sweep_s": round(stream_2m_s, 2),
            "scores_match_resident": bool(match),
        }
        print(json.dumps({"stage_a": out["stage_a"]}), flush=True)
        del s, cols, nnz
        gc.collect()

    # ---- stage B: wiki21m scale, host-streamed -------------------------
    n_b = args.rows
    t0 = time.perf_counter()
    cols, nnz = make_host_ell(n_b, seed=2)
    gen_s = time.perf_counter() - t0
    k = 100
    # host-exact reference scores for 4 queries (guaranteed-unique cols)
    q = make_queries(4, seed=3)  # prefix of the B=128/1024 sets
    exacts = [host_exact_scores(q[i], cols, nnz) for i in range(4)]
    import gc

    if not args.skip_stage_b:
        s = StreamedBitpackSearcher(cols, nnz, V, block_rows=1 << 18)
        bytes_per_sweep = s.cols.nbytes + s.nnz.nbytes

        stage_b = {"rows": n_b, "gen_s": round(gen_s, 1),
                   "sweep_gb": round(bytes_per_sweep / 1e9, 2),
                   "blocks": s.n_blocks}
        for b in b_list:
            qb = make_queries(b, seed=3)
            ids, scores = s.search(qb, k)  # compile sweep
            t0 = time.perf_counter()
            ids, scores = s.search(qb, k)
            sweep_s = time.perf_counter() - t0
            stage_b[f"qps_b{b}"] = round(b / sweep_s, 1)
            stage_b[f"sweep_s_b{b}"] = round(sweep_s, 1)
            stage_b[f"transfer_gbps_b{b}"] = round(
                bytes_per_sweep / sweep_s / 1e9, 3)

        ids, scores = s.search(q, k)
        recalls = []
        for i in range(4):
            ex = exacts[i]
            kth_score = -np.partition(-ex, k - 1)[k - 1]
            tol = 1e-2 * max(kth_score, 1.0)
            recalls.append(
                float((ex[ids[i]] >= kth_score - tol).mean()))
        stage_b["recall_vs_exact"] = round(float(np.mean(recalls)), 4)
        out["stage_b"] = stage_b
        print(json.dumps({"stage_b": stage_b}), flush=True)
        del s
        gc.collect()

    # ---- stage C: device-resident-ELL block tier, same scale ------------
    # the compact ELL (~5.4 GB at 21M as uint16) fits HBM even though
    # the packed matrix (~86 GB) does not: blocks re-pack ON DEVICE
    # inside the search program — no host traffic per query
    from vsearch_tpu.index import BoTIndex
    from vsearch_tpu.ops.ell import ELLMatrix

    idx = BoTIndex()
    if args.block_rows:
        idx.stream_block_rows = args.block_rows
    idx.set_ell(ELLMatrix(cols=cols, nnz=nnz, vals=None, num_cols=V,
                          sentinel_padded=False),
                host_cache=(cols, nnz))
    stage_c = {"rows": n_b, "tier": idx._oversize_tier(),
               "selection": idx._resolved_selection(),
               "block_selection": idx._block_selection(),
               "block_rows": idx.stream_block_rows}
    t0 = time.perf_counter()
    cols_d, nnz_d = idx._get_block_ell()
    import jax as _jax

    _jax.block_until_ready(cols_d)
    stage_c["ell_upload_s"] = round(time.perf_counter() - t0, 1)
    stage_c["ell_device_gb"] = round(
        (cols_d.nbytes + nnz_d.nbytes) / 1e9, 2)
    # A/B: the int8-selection path (block_int8=True, the default) vs
    # the bf16 bucketed scorer, same data and queries — the int8 rows
    # are the r5 attestation for VERDICT item 2
    for int8 in (True, False):
        idx.block_int8 = int8
        idx._block_fn = None
        tag = "int8" if int8 else "bf16"
        for b in b_list:
            qb = make_queries(b, seed=3)
            idx.search(qb, k=k)  # compile sweep
            t0 = time.perf_counter()
            idx.search(qb, k=k)
            sweep_s = time.perf_counter() - t0
            stage_c[f"{tag}_qps_b{b}"] = round(b / sweep_s, 1)
            stage_c[f"{tag}_sweep_s_b{b}"] = round(sweep_s, 2)
        # recall vs the SAME host-exact scores as stage B
        res4 = idx.search(q, k=k)
        recalls_c = []
        for i in range(4):
            ex = exacts[i]
            kth_score = -np.partition(-ex, k - 1)[k - 1]
            tol = 1e-2 * max(kth_score, 1.0)
            recalls_c.append(
                float((ex[np.asarray(res4.ids)[i]] >= kth_score - tol)
                      .mean()))
        stage_c[f"{tag}_recall_vs_exact"] = round(
            float(np.mean(recalls_c)), 4)
        print(json.dumps({f"stage_c_{tag}":
                          {kk: vv for kk, vv in stage_c.items()
                           if kk.startswith(tag)}}), flush=True)
    out["stage_c"] = stage_c
    print(json.dumps(out))


if __name__ == "__main__":
    main()
