"""Serving CLI: load a checkpoint + index, expose HTTP search/embed.

Usage:
  python -m vsearch_tpu.cli.serve --checkpoint ckpt \
      --index_file index.npz --data_file corpus.jsonl --port 8080
"""
from __future__ import annotations

import argparse
import logging

from .common import load_retriever, setup_logging

logger = logging.getLogger("vsearch_tpu.cli.serve")


def make_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--index_file", default=None)
    ap.add_argument("--data_file", default=None)
    ap.add_argument("--index_type", default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--default_k", type=int, default=10)
    ap.add_argument("--mesh_dp", type=int, default=0,
                    help="shard the index (and beta rerank) over this "
                         "many devices; 0 = single device")
    ap.add_argument("--search_mode", default=None,
                    choices=["auto", "exact", "bitpack",
                             "block", "stream"],
                    help="sparse/BoT scoring path (index.BoTIndex). "
                         "Default 'auto' picks by size and HBM budget, "
                         "including the >HBM tiers: 'block' keeps the "
                         "compact ELL device-resident and re-packs row "
                         "blocks on device; 'stream' streams "
                         "host-resident blocks through the device. "
                         "With --mesh_dp, 'block'/'stream' shard the "
                         "compact ELL and each chip scores blockwise "
                         "(indexes whose packed form exceeds even "
                         "per-shard HBM)")
    ap.add_argument("--selection", default=None,
                    choices=["auto", "exact", "approx", "bucketed",
                             "bucketed_approx"],
                    help="top-k selection policy (see "
                         "index.BoTIndex.selection; default 'auto' = "
                         "fused bucketed kernel)")
    ap.add_argument("--warmup", action="store_true",
                    help="run one search (+rerank on BoT indexes) "
                         "before accepting traffic, so the first "
                         "request doesn't pay the jit compile")
    ap.add_argument("--rerank_budget", type=int, default=None,
                    help="per-QUERY scalar-gather budget for the "
                         "sparse exact-rerank stage (candidates = "
                         "budget // nnz_pad); default 196608 = C=1536 "
                         "at nnz 128, the measured >=0.99-recall knee")
    ap.add_argument("--no_coalesce", action="store_true",
                    help="serialize requests with a lock instead of "
                         "merging concurrent /search calls into one "
                         "device batch")
    ap.add_argument("--compile_cache", default=None,
                    help="persistent XLA compilation cache directory "
                         "(default $VSEARCH_TPU_COMPILE_CACHE or "
                         "~/.cache/vsearch_tpu/xla; pass '' to "
                         "disable). Cuts restart cold-start from ~20 s "
                         "of Mosaic/XLA compiles to sub-second reloads")
    return ap


def prepare_retriever(args, ap):
    """Load checkpoint + index, apply the selection policy, shard over
    the mesh and warm up — everything main() does before binding the
    socket (split out so it is testable without a server loop)."""
    retriever = load_retriever(args.checkpoint)
    if args.index_file:
        retriever.load_index(index_file=args.index_file,
                             data_file=args.data_file,
                             index_type=args.index_type,
                             search_mode=args.search_mode)
        if args.selection:
            from ..index import BoTIndex, SparseIndex

            # NB: BoTIndex < SparseIndex < DenseIndex, so dispatch on
            # the most-derived type first — a bare isinstance check
            # against a base class would hijack every index type
            if isinstance(retriever.index, BoTIndex):
                retriever.index.selection = args.selection
            elif isinstance(retriever.index, SparseIndex):
                # real-valued sparse search never reads .selection
                # (its paths are driven by search_mode/rerank_budget);
                # accepting the flag would be a silent no-op
                ap.error(
                    "--selection has no effect on real-valued sparse "
                    "indexes (their search is driven by "
                    "--rerank_budget / search_mode); it applies to "
                    "bag-of-token and dense indexes")
            else:
                # plain dense: only 'approx' changes behavior
                # (everything else runs exact); reject policies that
                # would silently change meaning
                if args.selection in ("bucketed", "bucketed_approx"):
                    ap.error(
                        f"--selection {args.selection} applies to "
                        "bag-of-token indexes only; dense indexes "
                        "support auto/exact/approx")
                retriever.index.selection = (
                    "approx" if args.selection == "approx" else "exact")
            logger.info("top-k selection policy: %s",
                        retriever.index.selection)
    elif args.selection:
        ap.error("--selection requires --index_file (no index loaded)")
    elif args.search_mode:
        ap.error("--search_mode requires --index_file (no index "
                 "loaded)")
    if args.rerank_budget is not None:
        from ..index import BoTIndex, SparseIndex

        if retriever.index is None:
            ap.error("--rerank_budget requires --index_file")
        if not isinstance(retriever.index, SparseIndex):
            # DenseIndex has no rerank stage: the attribute would be
            # set but never read — reject instead of silently ignoring
            ap.error("--rerank_budget applies to real-valued sparse "
                     "indexes only (dense search has no rerank stage)")
        # the budget is only read by candidate-based search paths
        # (bit-proxy). Resolve which path this index will
        # actually take and reject the flag when that path is exact
        # scoring with no candidate/rerank stage — a bit-packed BoT
        # scorer, an explicit search_mode='exact', or a small index in
        # 'auto' mode would all set the attribute and never read it
        # (the silent-no-op knob class this validation exists to stop)
        idx = retriever.index
        bitpacked = (isinstance(idx, BoTIndex) and idx._use_bitpack())
        uses_budget = not bitpacked and idx._use_bitproxy()
        if uses_budget and args.mesh_dp:
            # mesh-sharded sparse search scores each shard exactly and
            # merges over ICI — no candidate stage reads the budget
            ap.error("--rerank_budget has no effect with --mesh_dp: "
                     "sharded sparse search scores each shard exactly "
                     "(per-shard scorer + ICI top-k merge) with no "
                     "candidate/rerank stage")
        if not uses_budget:
            # an oversize BoT in 'auto' mode still answers True from
            # _use_bitpack() but actually searches through the
            # block/stream tier — name the tier search will take, not
            # the resident scorer it bypasses
            tier = (idx._oversize_tier()
                    if isinstance(idx, BoTIndex) else None)
            path = (f"the exact on-device '{tier}' tier (blockwise "
                    "bit-packed scoring)" if bitpacked and tier else
                    "the exact bit-packed scorer" if bitpacked else
                    f"exact scoring (search_mode={idx.search_mode!r}, "
                    f"{idx.ell.shape[0]} rows <= exact_threshold "
                    f"{idx.exact_threshold})"
                    if idx.search_mode in ("auto", "exact")
                    else f"search_mode={idx.search_mode!r}")
            ap.error("--rerank_budget has no effect here: this index "
                     f"resolves to {path}, which has no "
                     "candidate/rerank stage; the budget applies to "
                     "real-valued sparse indexes searched via "
                     "bit-proxy candidates")
        retriever.index.rerank_budget = args.rerank_budget
    if args.mesh_dp:
        from ..parallel.mesh import make_mesh

        retriever.to_mesh(make_mesh(dp=args.mesh_dp, tp=1))
        logger.info("serving sharded over %d devices", args.mesh_dp)
    if args.warmup and retriever.index is not None:
        import time

        from ..index import IndexType

        t0 = time.time()
        # rerank needs passage texts; with --index_file but no
        # --data_file the index has vectors only, and warming the
        # rerank path would crash on index.get_sample()
        has_data = (getattr(retriever.index, "data", None) is not None
                    or getattr(retriever.index, "_lazy", None)
                    is not None)
        rerank = (retriever.index.index_type == IndexType.BAG_OF_TOKEN
                  and has_data)
        retriever.retrieve(["warmup"], k=min(args.default_k,
                                             len(retriever.index)),
                           rerank=rerank)
        logger.info("warmup done in %.1f s (search%s compiled)",
                    time.time() - t0, "+rerank" if rerank else "")
    return retriever


def main(argv=None):
    setup_logging()
    ap = make_parser()
    args = ap.parse_args(argv)

    from ..serve import serve
    from ..utils.claim_guard import register_tpu_process
    from ..utils.compile_cache import enable_compilation_cache

    # record this PID in the TPU-claim registry and make SIGTERM a
    # clean exit: a killed-but-not-cleanly-exited server wedges the
    # single-chip claim for every later process (round-3 postmortem)
    register_tpu_process("serve")
    cache = enable_compilation_cache(args.compile_cache)
    if cache:
        logger.info("persistent compilation cache: %s", cache)
    retriever = prepare_retriever(args, ap)
    server = serve(retriever, host=args.host, port=args.port,
                   default_k=args.default_k,
                   coalesce=not args.no_coalesce)
    try:
        server.serve_forever()
    except (KeyboardInterrupt, SystemExit):
        server.shutdown()


if __name__ == "__main__":
    main()
