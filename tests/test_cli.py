"""End-to-end CLI pipeline tests: build index -> search -> score,
mirroring the reference's wiki21m pipeline on a tiny corpus."""
import json

import numpy as np
import pytest

from tests.helpers import make_tokenizer, tiny_bert_config
from vsearch_tpu.retriever import Retriever, RetrieverConfig

CORPUS = [
    {"text": "green tea is a drink", "title": "tea"},
    {"text": "the red planet mars has ice water", "title": "mars"},
    {"text": "einstein wrote the theory of relativity", "title": "re"},
    {"text": "a big dog runs fast in the city", "title": "dog"},
    {"text": "the river water runs slow", "title": "river"},
    {"text": "physics is the theory of space and time", "title": "phys"},
]
QUERIES = ["who wrote the theory of relativity", "green tea drink"]
ANSWERS = [["einstein"], ["tea"]]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    corpus = d / "corpus.jsonl"
    corpus.write_text("\n".join(json.dumps(r) for r in CORPUS) + "\n")
    queries = d / "queries.jsonl"
    queries.write_text("\n".join(
        json.dumps({"question": q}) for q in QUERIES) + "\n")
    qa = d / "qa.csv"
    qa.write_text("\n".join(f"{q}\t{a!r}" for q, a in zip(QUERIES,
                                                          ANSWERS)) + "\n")
    # tiny checkpoint
    tok = make_tokenizer()
    enc = {
        "type": "vdr", "max_len": 32, "topk": 16, "shift_vocab_num": 5,
        **{k: v for k, v in vars(tiny_bert_config(tok.vocab_size)).items()
           if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size",
                    "max_position_embeddings")},
    }
    cfg = RetrieverConfig(encoder_q=dict(enc), encoder_p=dict(enc),
                          shared_encoder=True)
    r = Retriever(cfg, tokenizer=tok)
    ckpt = d / "ckpt"
    r.save_pretrained(str(ckpt))
    return d


def test_checkpoint_self_contained(workdir):
    """from_pretrained works with no tokenizer argument (dir vocab)."""
    r = Retriever.from_pretrained(str(workdir / "ckpt"))
    emb = r.encoder_q.embed(["green tea"])
    assert emb.shape[0] == 1


def test_binary_token_index_cli(workdir):
    from vsearch_tpu.cli.build_index.binary_token_index import main

    save = str(workdir / "bot.npz")
    main(["--text_file", str(workdir / "corpus.jsonl"),
          "--save_file", save,
          "--num_shift", "5",
          "--tokenizer", str(workdir / "ckpt"),
          "--num_workers", "1"])
    import scipy.sparse as sp
    mat = sp.load_npz(save)
    assert mat.shape[0] == len(CORPUS)


def test_sparse_index_build_search_score_pipeline(workdir):
    from vsearch_tpu.cli.build_index.sparse_index import main as build
    from vsearch_tpu.cli.search.search_sparse_index import main as search
    from vsearch_tpu.cli.score.eval_wiki21m import main as score

    idx = str(workdir / "sparse_index.npz")
    build(["--checkpoint", str(workdir / "ckpt"),
           "--text_file", str(workdir / "corpus.jsonl"),
           "--save_file", idx, "--batch_size", "4"])
    results = str(workdir / "results.json")
    search(["--checkpoint", str(workdir / "ckpt"),
            "--query_file", str(workdir / "queries.jsonl"),
            "--index_file", idx, "--save_file", results,
            "--batch_size_q", "2", "--topk", "3"])
    with open(results) as f:
        res = json.load(f)
    assert len(res) == 2
    assert len(res[0]["ids"]) == 3
    score(["--result_file", results,
           "--text_file", str(workdir / "corpus.jsonl"),
           "--qa_file", str(workdir / "qa.csv")])


def test_sharded_build_then_glob_search(workdir):
    from vsearch_tpu.cli.build_index.binary_token_index import main

    for shard in range(2):
        main(["--text_file", str(workdir / "corpus.jsonl"),
              "--save_file", str(workdir / f"bot_shard{shard}.npz"),
              "--num_shift", "5",
              "--tokenizer", str(workdir / "ckpt"),
              "--num_shard", "2", "--shard_id", str(shard),
              "--num_workers", "1"])
    r = Retriever.from_pretrained(str(workdir / "ckpt"))
    r.load_index(index_file=str(workdir / "bot_shard*.npz"),
                 index_type="bag_of_token")
    assert len(r.index) == len(CORPUS)


def test_beta_search_cli(workdir):
    from vsearch_tpu.cli.build_index.binary_token_index import main as build
    from vsearch_tpu.cli.search.beta_search import main as beta

    idx = str(workdir / "bot2.npz")
    build(["--text_file", str(workdir / "corpus.jsonl"),
           "--save_file", idx, "--num_shift", "5",
           "--tokenizer", str(workdir / "ckpt"), "--num_workers", "1"])
    results = str(workdir / "beta_results.json")
    beta(["--checkpoint", str(workdir / "ckpt"),
          "--query_file", str(workdir / "queries.jsonl"),
          "--text_file", str(workdir / "corpus.jsonl"),
          "--index_file", idx, "--save_file", results,
          "--batch_size_q", "2", "--topk", "3", "--num_rerank", "3"])
    with open(results) as f:
        res = json.load(f)
    assert len(res) == 2 and len(res[0]["ids"]) == 3


def test_eval_accuracy_computation():
    from vsearch_tpu.cli.score.eval_wiki21m import evaluate

    texts = ["einstein made relativity", "the cat", "the dog"]
    results = [{"question": "who", "ids": [1, 0, 2], "scores": [3, 2, 1]}]
    qa = [("who", ["einstein"])]
    acc = evaluate(results, texts, qa, topk_levels=(1, 2, 3))
    assert acc[1] == 0.0 and acc[2] == 1.0 and acc[3] == 1.0


def test_serve_warmup_without_data_file(workdir):
    """Advisor (round 2): --warmup on a BoT index loaded via
    --index_file but WITHOUT --data_file crashed at startup (rerank
    warmup indexed data=None); it must warm plain search instead."""
    from vsearch_tpu.cli.build_index.binary_token_index import main as build
    from vsearch_tpu.cli.serve import make_parser, prepare_retriever

    idx = str(workdir / "bot_serve.npz")
    build(["--text_file", str(workdir / "corpus.jsonl"),
           "--save_file", idx, "--num_shift", "5",
           "--tokenizer", str(workdir / "ckpt"), "--num_workers", "1"])
    ap = make_parser()
    args = ap.parse_args(["--checkpoint", str(workdir / "ckpt"),
                          "--index_file", idx,
                          "--index_type", "bag_of_token", "--warmup"])
    r = prepare_retriever(args, ap)  # must not raise
    assert r.index is not None


def test_serve_selection_bucketed_accepted_for_bot(workdir):
    """Regression: BoTIndex subclasses DenseIndex, so an isinstance
    check against DenseIndex rejected --selection bucketed for exactly
    the index type it is documented for."""
    from vsearch_tpu.cli.build_index.binary_token_index import main as build
    from vsearch_tpu.cli.serve import make_parser, prepare_retriever

    idx = str(workdir / "bot_sel.npz")
    build(["--text_file", str(workdir / "corpus.jsonl"),
           "--save_file", idx, "--num_shift", "5",
           "--tokenizer", str(workdir / "ckpt"), "--num_workers", "1"])
    ap = make_parser()
    args = ap.parse_args(["--checkpoint", str(workdir / "ckpt"),
                          "--index_file", idx,
                          "--index_type", "bag_of_token",
                          "--selection", "bucketed"])
    r = prepare_retriever(args, ap)
    assert r.index.selection == "bucketed"


def test_serve_selection_validation(workdir):
    """--selection bucketed on a dense index and --selection without
    --index_file must fail fast instead of being silently dropped."""
    from vsearch_tpu.cli.build_index.dense_index import main as build
    from vsearch_tpu.cli.serve import make_parser, prepare_retriever

    idx = str(workdir / "dense_serve.pt")
    build(["--checkpoint", str(workdir / "ckpt"),
           "--text_file", str(workdir / "corpus.jsonl"),
           "--save_file", idx, "--batch_size", "4"])
    ap = make_parser()
    args = ap.parse_args(["--checkpoint", str(workdir / "ckpt"),
                          "--index_file", idx, "--index_type", "dense",
                          "--selection", "bucketed"])
    with pytest.raises(SystemExit):
        prepare_retriever(args, ap)
    # approx maps through; auto resolves to exact for dense
    args = ap.parse_args(["--checkpoint", str(workdir / "ckpt"),
                          "--index_file", idx, "--index_type", "dense",
                          "--selection", "approx"])
    r = prepare_retriever(args, ap)
    assert r.index.selection == "approx"
    args = ap.parse_args(["--checkpoint", str(workdir / "ckpt"),
                          "--selection", "exact"])
    with pytest.raises(SystemExit):
        prepare_retriever(args, ap)


def test_eval_beir_cli(workdir):
    import json as _json

    from vsearch_tpu.cli.score.eval_beir import main as beir

    d = workdir
    (d / "beir_corpus.jsonl").write_text("\n".join(
        _json.dumps({"_id": f"d{i}", "title": r["title"],
                     "text": r["text"]})
        for i, r in enumerate(CORPUS)) + "\n")
    (d / "beir_queries.jsonl").write_text("\n".join(
        _json.dumps({"_id": f"q{i}", "text": q})
        for i, q in enumerate(QUERIES)) + "\n")
    (d / "qrels.tsv").write_text(
        "query-id\tcorpus-id\tscore\nq0\td2\t1\nq1\td0\t1\n")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        beir(["--checkpoint", str(d / "ckpt"),
              "--corpus_file", str(d / "beir_corpus.jsonl"),
              "--query_file", str(d / "beir_queries.jsonl"),
              "--qrels_file", str(d / "qrels.tsv"),
              "--topk", "3", "--ks", "1,3"])
    out = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert set(out) == {"ndcg@1", "ndcg@3", "recall@1", "recall@3",
                        "mrr@1", "mrr@3"}
    assert all(0.0 <= v <= 1.0 for v in out.values())


def test_serve_rerank_budget_knob(workdir, monkeypatch):
    from vsearch_tpu.cli.build_index.sparse_index import main as build
    from vsearch_tpu.cli.serve import make_parser, prepare_retriever
    from vsearch_tpu.index import SparseIndex

    idx = str(workdir / "sparse_budget.npz")
    build(["--checkpoint", str(workdir / "ckpt"),
           "--text_file", str(workdir / "corpus.jsonl"),
           "--save_file", idx, "--batch_size", "4"])
    ap = make_parser()
    budget_args = ["--checkpoint", str(workdir / "ckpt"),
                   "--index_file", idx, "--index_type", "sparse",
                   "--rerank_budget", "65536"]
    # a 6-row index resolves to exact scoring, where the budget is
    # never read — the CLI must reject it there (advisor, round 3)
    args = ap.parse_args(budget_args)
    with pytest.raises(SystemExit):
        prepare_retriever(args, ap)
    # force the bit-proxy candidate path (what a large index takes on
    # TPU): the budget is read there, so the flag must be accepted
    monkeypatch.setattr(SparseIndex, "_use_bitproxy", lambda self: True)
    args = ap.parse_args(budget_args)
    r = prepare_retriever(args, ap)
    assert r.index.rerank_budget == 65536
    args = ap.parse_args(["--checkpoint", str(workdir / "ckpt"),
                          "--rerank_budget", "1"])
    with pytest.raises(SystemExit):
        prepare_retriever(args, ap)


def test_serve_rerank_budget_rejected_on_bitpack_bot(workdir,
                                                     monkeypatch):
    """--rerank_budget is a silent no-op on the exact bit-packed BoT
    scorer (no rerank stage reads it) — the CLI must reject it there
    just as it does for dense (review finding, round 3)."""
    from vsearch_tpu.cli.build_index.binary_token_index import \
        main as build
    from vsearch_tpu.cli.serve import make_parser, prepare_retriever
    from vsearch_tpu.index import BoTIndex

    idx = str(workdir / "bot_budget.bot.npz")
    build(["--text_file", str(workdir / "corpus.jsonl"),
           "--save_file", idx, "--num_shift", "5",
           "--tokenizer", str(workdir / "ckpt"),
           "--num_workers", "1"])
    # on CPU the small index wouldn't route through bitpack; force the
    # TPU-serving dispatch the validation is about
    monkeypatch.setattr(BoTIndex, "_use_bitpack", lambda self: True)
    ap = make_parser()
    args = ap.parse_args(["--checkpoint", str(workdir / "ckpt"),
                          "--index_file", idx,
                          "--rerank_budget", "65536"])
    with pytest.raises(SystemExit):
        prepare_retriever(args, ap)


def test_eval_misaligned_files_rejected():
    """Misaligned result/qa files must error, not silently truncate
    the zip and report a wrong accuracy (review finding, round 3)."""
    from vsearch_tpu.cli.score.eval_wiki21m import evaluate

    results = [{"question": "a", "ids": [0], "scores": [1.0]}]
    qa = [("a", ["x"]), ("b", ["y"])]
    with pytest.raises(ValueError, match="misaligned"):
        evaluate(results, ["passage"], qa)


def test_read_queries_rejects_missing_field(tmp_path):
    """A jsonl query object without question/query/text must fail at
    READ time with the offending line, not deep inside the tokenizer
    (review finding, round 3)."""
    from vsearch_tpu.cli.common import read_queries

    p = tmp_path / "q.jsonl"
    p.write_text('{"_id": "q1", "query_text": "oops"}\n')
    with pytest.raises(ValueError, match="question/query/text"):
        read_queries(str(p))


def test_serve_search_mode_passthrough_and_validation(workdir):
    """--search_mode reaches the loaded BoT index (residency is decided
    at load time); on a dense index or without --index_file it must
    fail fast instead of being silently dropped."""
    from vsearch_tpu.cli.build_index.binary_token_index import main as build
    from vsearch_tpu.cli.serve import make_parser, prepare_retriever

    idx = str(workdir / "bot_mode.npz")
    build(["--text_file", str(workdir / "corpus.jsonl"),
           "--save_file", idx, "--num_shift", "5",
           "--tokenizer", str(workdir / "ckpt"), "--num_workers", "1"])
    ap = make_parser()
    args = ap.parse_args(["--checkpoint", str(workdir / "ckpt"),
                          "--index_file", idx,
                          "--index_type", "bag_of_token",
                          "--search_mode", "stream"])
    r = prepare_retriever(args, ap)
    assert r.index.search_mode == "stream"
    assert r.index._oversize_tier() == "stream"

    # dense index rejects search_mode at load time
    from vsearch_tpu.cli.build_index.dense_index import main as dbuild

    didx = str(workdir / "dense_mode.pt")
    dbuild(["--checkpoint", str(workdir / "ckpt"),
            "--text_file", str(workdir / "corpus.jsonl"),
            "--save_file", didx, "--batch_size", "4"])
    args = ap.parse_args(["--checkpoint", str(workdir / "ckpt"),
                          "--index_file", didx, "--index_type", "dense",
                          "--search_mode", "block"])
    with pytest.raises(ValueError, match="dense"):
        prepare_retriever(args, ap)

    # no index loaded -> argparse error
    args = ap.parse_args(["--checkpoint", str(workdir / "ckpt"),
                          "--search_mode", "stream"])
    with pytest.raises(SystemExit):
        prepare_retriever(args, ap)


def test_serve_rerank_budget_message_names_oversize_tier(
        workdir, monkeypatch, capsys):
    """When an oversize BoT resolves to the block/stream tier, the
    --rerank_budget rejection must name that tier, not 'the exact
    bit-packed scorer' it bypasses (ADVICE r4: misleading diagnostic)."""
    from vsearch_tpu.cli.build_index.binary_token_index import \
        main as build
    from vsearch_tpu.cli.serve import make_parser, prepare_retriever
    from vsearch_tpu.index import BoTIndex

    idx = str(workdir / "bot_tiermsg.bot.npz")
    build(["--text_file", str(workdir / "corpus.jsonl"),
           "--save_file", idx, "--num_shift", "5",
           "--tokenizer", str(workdir / "ckpt"),
           "--num_workers", "1"])
    monkeypatch.setattr(BoTIndex, "_use_bitpack", lambda self: True)
    monkeypatch.setattr(BoTIndex, "_oversize_tier",
                        lambda self: "block")
    ap = make_parser()
    args = ap.parse_args(["--checkpoint", str(workdir / "ckpt"),
                          "--index_file", idx,
                          "--rerank_budget", "65536"])
    with pytest.raises(SystemExit):
        prepare_retriever(args, ap)
    err = capsys.readouterr().err
    assert "'block' tier" in err
    assert "the exact bit-packed scorer" not in err
