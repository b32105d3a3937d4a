"""End-to-end RANKING parity against the reference's OWN Retriever.

Encoder-level parity (test_reference_parity.py) leaves the
retriever/index/rerank COMPOSITION unverified. Here the reference's
``src.ir.Retriever`` (torch CPU, imported from /root/reference) and our
``vsearch_tpu.retriever.Retriever`` run on an IDENTICAL tiny corpus with
IDENTICAL weights (converted via the reference's own HF
``save_pretrained`` checkpoint layout), and the returned top-k id
sequences must match for all four retrieval paths:

  * alpha  — sparse parametric search (reference retriever.py:107-136,
    index.py:163-218)
  * beta   — bag-of-token first stage + on-the-fly rerank
    (reference retriever.py:137-147, _build_bot_vectors :208-253)
  * dense  — DPR CLS embeddings + dense index (reference dpr.py:33-46,
    index.py:88-94)
  * crossmodal — VDRTextEncoder queries vs an image-embedding index
    (reference vdr_crossmodal_text.py:28-57, retriever.py:107-136)

CPU-forced deviations from the reference defaults (documented, not
semantic): BoT vectors are built with ``fp16=False`` because torch CPU
sparse-CSR matmul has no Half kernel ("addmm_out_sparse_csr_impl_mkl"
not implemented) — the reference ran fp16 on CUDA only.
"""
import importlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.test_reference_parity import (SHIFT, VOCAB, _full_vocab_lines,
                                         _import_reference_vdr,
                                         remove_reference_stubs)
from vsearch_tpu.retriever import Retriever


@pytest.fixture(scope="module", autouse=True)
def _stub_hygiene():
    # _import_reference_vdr stubs absent packages (wordcloud, spacy, ...)
    # into sys.modules; drop them after this module so later tests see
    # the real import errors (utils.vis probes wordcloud at call time)
    yield
    remove_reference_stubs()

# small full-vocab BERT: the vocab must stay 30522 (VALID_TOKEN_IDS and
# shift 999 are vocab-anchored) but body dims can shrink for CI speed
# MAXPOS >= 128: the reference _build_embedding_vectors hardcodes
# max_len=128 (retriever.py:259) and DPR encode pads to max_length
HID, LAYERS, HEADS, INTER, MAXPOS = 128, 2, 4, 256, 128


@pytest.fixture(scope="module")
def ref_pkg():
    _import_reference_vdr()  # installs dependency stubs + sys.path
    return importlib.import_module("src.ir.retriever.retriever")


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("e2e_vocab") / "vocab.txt"
    p.write_text("\n".join(_full_vocab_lines()), encoding="utf-8")
    return str(p)


def _patch_hf(mp, enc_mod, vocab_file, hf_cfg, seed):
    def fake_model(*a, **k):
        torch.manual_seed(seed)
        return transformers.BertModel(hf_cfg, add_pooling_layer=False)

    mp.setattr(enc_mod.AutoModel, "from_pretrained", fake_model)
    mp.setattr(enc_mod.AutoTokenizer, "from_pretrained",
               lambda *a, **k: transformers.BertTokenizerFast(
                   vocab_file=vocab_file, do_lower_case=True))


def _make_ref_retriever(ref_pkg, vocab_file, enc_type, seed=0, topk=128):
    """Reference Retriever on random small-dims weights, built through
    its own config/registry machinery (biencoder.py:48-59)."""
    hf_cfg = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=MAXPOS)
    enc_mod = importlib.import_module(f"src.ir.encoder.{enc_type}")
    mp = pytest.MonkeyPatch()
    _patch_hf(mp, enc_mod, vocab_file, hf_cfg, seed)
    enc_cfg = dict(
        type=enc_type, model_id="bert-base-uncased", max_len=48,
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=MAXPOS, topk=topk)
    if enc_type == "vdr":
        enc_cfg.update(shift_vocab_num=SHIFT, pooling="max",
                       pooling_topk=0, norm=False)
    cfg = ref_pkg.RetrieverConfig(
        encoder_q=dict(enc_cfg), encoder_p=dict(enc_cfg),
        shared_encoder=True, max_len=48)
    ir = ref_pkg.Retriever(cfg).eval()
    if enc_type == "vdr":
        with torch.no_grad():  # non-trivial LN so head math is exercised
            torch.manual_seed(seed + 1)
            ir.encoder_q.ln.weight.uniform_(0.8, 1.2)
            ir.encoder_q.ln.bias.uniform_(-0.05, 0.05)
    mp.undo()
    return ir


def _convert(ref_ir, tmp_path_factory, tag):
    """Round-trip through the reference's own checkpoint format:
    HF save_pretrained dir -> our Retriever.from_pretrained."""
    d = tmp_path_factory.mktemp(f"e2e_ckpt_{tag}")
    ref_ir.save_pretrained(str(d), safe_serialization=False)
    (d / "vocab.txt").write_text("\n".join(_full_vocab_lines()),
                                 encoding="utf-8")
    return Retriever.from_pretrained(str(d))


def _corpus(n=24, seed=5, lo=1000, hi=1800, words=12):
    r = np.random.default_rng(seed)
    return [" ".join(f"w{w}" for w in
                     r.choice(np.arange(lo, hi), size=words,
                              replace=False))
            for _ in range(n)]


def _queries(texts, picks=(0, 7, 13), words=5):
    return [" ".join(t.split()[:words]) for t in (texts[i] for i in picks)]


def _structured_corpus(seed=8, n_queries=3, ladder=5, distractors=9):
    """Corpus where each query provably has ``ladder`` passages with
    DISTINCT positive first-stage scores: passage (i, j) contains j+1 of
    query i's five words plus wide-vocab fillers. Zero-overlap passages
    tie at score ~0, and a top-k that dips into that tie pool is
    non-deterministic across frameworks — this corpus keeps the top-k
    inside the distinct-score ladder."""
    r = np.random.default_rng(seed)
    qwords = [[f"w{1000 + 10 * i + t}" for t in range(5)]
              for i in range(n_queries)]
    texts = []
    for i in range(n_queries):
        for j in range(ladder):
            take = qwords[i][: j + 1]
            fill = [f"w{w}" for w in
                    r.integers(2000, 28000, size=12 - len(take))]
            texts.append(" ".join(take + fill))
    for _ in range(distractors):
        texts.append(" ".join(
            f"w{w}" for w in r.integers(2000, 28000, size=12)))
    return texts, [" ".join(qw) for qw in qwords]


def _assert_ranking_match(ref_res, our_res, tol=5e-3):
    """Top-k id sequences must match; inside groups of reference scores
    closer than ``tol`` (rank ties at numerical noise level) any
    permutation is accepted — torch and XLA may break exact ties
    differently, which is not a ranking divergence."""
    ref_ids = np.asarray(ref_res.ids)
    ref_scores = np.asarray(ref_res.scores, dtype=np.float64)
    our_ids = np.asarray(our_res.ids)
    our_scores = np.asarray(our_res.scores, dtype=np.float64)
    assert ref_ids.shape == our_ids.shape
    np.testing.assert_allclose(our_scores, ref_scores,
                               rtol=tol, atol=tol)
    for qi in range(ref_ids.shape[0]):
        start = 0
        k = ref_ids.shape[1]
        for pos in range(1, k + 1):
            boundary = (pos == k or
                        ref_scores[qi, pos - 1] - ref_scores[qi, pos]
                        > tol * max(1.0, abs(ref_scores[qi, pos])))
            if boundary:
                # the trailing group's tie may extend past rank k to
                # candidates neither side returned (e.g. many passages
                # scoring exactly 0), so its membership is not unique —
                # its score agreement is already covered by allclose
                if pos < k:
                    assert (set(our_ids[qi, start:pos].tolist())
                            == set(ref_ids[qi, start:pos].tolist())), (
                        f"query {qi} positions [{start}:{pos}]: "
                        f"ref ids {ref_ids[qi]} scores {ref_scores[qi]} "
                        f"vs ours {our_ids[qi]} scores {our_scores[qi]}")
                start = pos


@pytest.fixture(scope="module")
def vdr_pair(ref_pkg, vocab_file, tmp_path_factory):
    ref_ir = _make_ref_retriever(ref_pkg, vocab_file, "vdr", seed=0)
    ours = _convert(ref_ir, tmp_path_factory, "vdr")
    return ref_ir, ours


def test_alpha_sparse_ranking_parity(vdr_pair):
    """Alpha search: parametric embeddings -> sparse index -> top-k
    (reference build_index SPARSE branch, retriever.py:298-305)."""
    ref_ir, ours = vdr_pair
    texts = _corpus(seed=5)
    queries = _queries(texts)
    k = 5

    ref_ir.build_index(texts, index_type="sparse")
    ref_res = ref_ir.retrieve(queries, k=k, batch_size=32)

    ours.build_index(texts, index_type="sparse")
    our_res = ours.retrieve(queries, k=k, batch_size=32)
    _assert_ranking_match(ref_res, our_res)


def test_beta_bot_rerank_ranking_parity(ref_pkg, vdr_pair):
    """Beta search: tokenizer-only BoT first stage, then on-the-fly
    re-embedding rerank (reference retriever.py:137-147)."""
    ref_ir, ours = vdr_pair
    texts, queries = _structured_corpus(seed=6)
    k = 4

    index_mod = importlib.import_module("src.ir.retriever.index")
    # reference build_index hardcodes fp16 BoT vectors
    # (retriever.py:311); torch CPU sparse fp16 matmul is unimplemented,
    # so build through the reference's own _build_bot_vectors with
    # fp16=False — the only CPU-viable configuration of its code
    ref_idx = index_mod.BoTIndex()
    ref_idx.data = texts
    ref_idx.vector = ref_ir._build_bot_vectors(texts, batch_size=32,
                                               fp16=False)
    ref_idx.move_to_device("cpu")
    ref_ir.index = ref_idx
    ref_first = ref_ir.retrieve(queries, k=k, batch_size=32)
    ref_res = ref_ir.retrieve(queries, k=k, rerank=True, batch_size=32)

    ours.build_index(texts, index_type="bag_of_token")
    our_first = ours.retrieve(queries, k=k, batch_size=32)
    our_res = ours.retrieve(queries, k=k, rerank=True, batch_size=32)
    # binary first-stage scores are sums over continuous query weights:
    # ties only for identical token sets, which _corpus avoids
    _assert_ranking_match(ref_first, our_first)
    _assert_ranking_match(ref_res, our_res)


def test_dense_dpr_ranking_parity(ref_pkg, vocab_file, tmp_path_factory):
    """Dense DPR: CLS embeddings, dense dot-product index
    (reference dpr.py:33-46, build_index DENSE branch)."""
    ref_ir = _make_ref_retriever(ref_pkg, vocab_file, "dpr", seed=2)
    ours = _convert(ref_ir, tmp_path_factory, "dpr")
    texts = _corpus(seed=7)
    queries = _queries(texts, picks=(1, 8, 20))
    k = 5

    ref_ir.build_index(texts, index_type="dense")
    ref_res = ref_ir.retrieve(queries, k=k, batch_size=32)

    ours.build_index(texts, index_type="dense")
    our_res = ours.retrieve(queries, k=k, batch_size=32)
    _assert_ranking_match(ref_res, our_res)


def test_crossmodal_ranking_parity(ref_pkg, vocab_file,
                                   tmp_path_factory):
    """Crossmodal retrieval: VDRTextEncoder queries against an index of
    VDRImageEncoder embeddings, both sides embedding the SAME random
    pixels with converted weights (reference vdr_crossmodal_text.py:
    28-57, vdr_crossmodal_image.py:212-227, README.md:258-269)."""
    text_mod = importlib.import_module(
        "src.ir.encoder.vdr_crossmodal_text")
    image_mod = importlib.import_module(
        "src.ir.encoder.vdr_crossmodal_image")
    index_mod = importlib.import_module("src.ir.retriever.index")

    hf_cfg = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=MAXPOS)
    mp = pytest.MonkeyPatch()
    _patch_hf(mp, text_mod, vocab_file, hf_cfg, seed=3)
    mp.setattr(image_mod.AutoTokenizer, "from_pretrained",
               lambda *a, **k: transformers.BertTokenizerFast(
                   vocab_file=vocab_file, do_lower_case=True))
    text_cfg = dict(
        type="vdr_crossmodal_text", model_id="bert-base-uncased",
        max_len=48, vocab_size=VOCAB, hidden_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=INTER, max_position_embeddings=MAXPOS,
        topk=128)
    image_cfg = dict(
        type="vdr_crossmodal_image", resolution=224, patch_size=56,
        width=64, layers=2, heads=4, topk=128)
    cfg = ref_pkg.RetrieverConfig(encoder_q=dict(text_cfg),
                                  encoder_p=dict(image_cfg),
                                  shared_encoder=False, max_len=48)
    torch.manual_seed(4)
    ref_ir = ref_pkg.Retriever(cfg).eval()
    with torch.no_grad():
        torch.manual_seed(5)
        ref_ir.encoder_q.ln.weight.uniform_(0.8, 1.2)
        ref_ir.encoder_q.ln.bias.uniform_(-0.05, 0.05)
    mp.undo()
    ours = _convert(ref_ir, tmp_path_factory, "crossmodal")

    r = np.random.default_rng(11)
    pixels = r.normal(size=(6, 3, 224, 224)).astype(np.float32)
    queries = _queries(_corpus(seed=9), picks=(0, 1))
    k = 3

    with torch.no_grad():
        ref_embs = ref_ir.encoder_p.embed(torch.tensor(pixels),
                                          topk=128)
    ref_idx = index_mod.Index()
    ref_idx.data = [f"img{i}" for i in range(len(pixels))]
    ref_idx.vector = ref_embs
    ref_ir.index = ref_idx
    ref_res = ref_ir.retrieve(queries, k=k, batch_size=32)

    from vsearch_tpu.index import DenseIndex

    our_idx = DenseIndex()
    our_idx.set_vectors(np.asarray(ours.encoder_p.embed(pixels,
                                                        topk=128)))
    our_idx.data = ref_idx.data
    ours.index = our_idx
    our_res = ours.retrieve(queries, k=k, batch_size=32)
    _assert_ranking_match(ref_res, our_res)
