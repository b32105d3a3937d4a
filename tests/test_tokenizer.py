"""Tokenizer tests: python WordPiece behavior + native C++ parity."""
import numpy as np
import pytest

from tests.helpers import make_tokenizer, make_vocab
from vsearch_tpu.tokenization.wordpiece import WordPieceTokenizer


@pytest.fixture(scope="module")
def tok():
    return make_tokenizer()


def test_basic_wordpiece(tok):
    toks = tok.tokenize("green tea")
    assert toks == ["green", "tea"]


def test_subword_split(tok):
    # 'runs' is in vocab whole; an unknown word splits into pieces
    assert tok.tokenize("runs") == ["runs"]
    pieces = tok.tokenize("teaing")  # tea + ##ing
    assert pieces == ["tea", "##ing"]


def test_unknown_token(tok):
    assert tok.tokenize("ZZZZ@@##!!") != []  # punct split, chars known
    v = WordPieceTokenizer({"[PAD]": 0, "[UNK]": 1, "[CLS]": 2,
                            "[SEP]": 3, "a": 4})
    assert v.tokenize("xyz") == ["[UNK]"]


def test_punctuation_and_case(tok):
    toks = tok.tokenize("Green, TEA!")
    assert toks == ["green", ",", "tea", "!"]


def test_encode_specials_and_truncation(tok):
    ids = tok.encode("green tea", max_length=16)
    assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
    short = tok.encode("the " * 50, max_length=8)
    assert len(short) == 8
    assert short[-1] == tok.sep_id


def test_decode_roundtrip(tok):
    ids = tok.encode("green tea is a drink")
    assert tok.decode(ids) == "green tea is a drink"


def test_accent_folding(tok):
    assert tok.tokenize("Grëen") == ["green"]


@pytest.fixture(scope="module")
def native_tok():
    pytest.importorskip("ctypes")
    try:
        from vsearch_tpu.tokenization.native import (
            NativeWordPieceTokenizer)
        return NativeWordPieceTokenizer(make_vocab())
    except Exception as exc:  # g++ missing etc.
        pytest.skip(f"native tokenizer unavailable: {exc}")


TEXTS = [
    "Green tea is a drink!",
    "the red PLANET mars, has ice-water on the surface...",
    "Einstein wrote the famous Theory of Relativity",
    "Grëen tèa",
    "runs running teaing slowly",
    "",
    "a",
    "word " * 300,  # long truncation
    "中文 characters 漢字 mixed",
    "punct@@@only!!! ???",
]


def test_native_matches_python(native_tok):
    py = make_tokenizer()
    for text in TEXTS:
        expect = py.encode(text, max_length=64)
        got = native_tok.encode(text, max_length=64)
        assert got == expect, f"mismatch on {text!r}: {got} != {expect}"


def test_native_batch_padded(native_tok):
    ids, lens = native_tok.encode_batch_padded(TEXTS[:4], max_length=32)
    assert ids.shape == (4, 32)
    py = make_tokenizer()
    for i, t in enumerate(TEXTS[:4]):
        expect = py.encode(t, max_length=32)
        assert ids[i, : lens[i]].tolist() == expect
        assert (ids[i, lens[i]:] == 0).all()


def test_native_bot_batch(native_tok):
    py = make_tokenizer()
    shift, cap, nnz_pad = 5, 64, 128
    cols, nnz = native_tok.encode_bot_batch(TEXTS[:5], max_len=64,
                                            shift=shift, cap=cap,
                                            nnz_pad=nnz_pad)
    for i, t in enumerate(TEXTS[:5]):
        ids = py.encode(t, max_length=64)
        seen = {}
        for tid in ids:
            if tid >= shift and tid not in seen:
                seen[tid] = None
                if len(seen) >= cap:
                    break
        expect = [tid - shift for tid in seen]
        assert cols[i, : nnz[i]].tolist() == expect


def test_native_bot_build_integration(native_tok):
    from vsearch_tpu.index.bot_build import build_bot_ell

    texts = ["green tea drink", "mars planet red surface"] * 3
    ell = build_bot_ell(native_tok, texts, max_len=32, shift=5,
                        num_workers=1)
    py_ell = build_bot_ell(make_tokenizer(), texts, max_len=32, shift=5,
                           num_workers=1)
    np.testing.assert_array_equal(np.asarray(ell.nnz),
                                  np.asarray(py_ell.nnz))
    np.testing.assert_array_equal(np.asarray(ell.cols),
                                  np.asarray(py_ell.cols))


def test_native_gapped_vocab_ids_agree(native_tok):
    """A vocab with id gaps (e.g. blank vocab.txt lines skipped by the
    loader) must still encode to the PYTHON dict's ids — the C++ core
    numbers by line position and previously renumbered every token
    after a gap (review finding, round 3)."""
    from vsearch_tpu.tokenization.native import NativeWordPieceTokenizer

    vocab = dict(make_vocab())
    # open a gap: move the last token's id up by 3
    last_tok = max(vocab, key=vocab.get)
    vocab[last_tok] = vocab[last_tok] + 3
    nt = NativeWordPieceTokenizer(vocab)
    ids = nt.encode(f"green tea {last_tok}", add_special_tokens=False)
    assert ids[-1] == vocab[last_tok]
    # ids round-trip through the python-side maps
    assert nt.convert_ids_to_tokens([ids[-1]]) == [last_tok]


def test_native_tokenize_no_giant_buffer(native_tok):
    """tokenize() must not allocate a fixed huge buffer: the parity
    method previously encoded with max_length=2**30 = a 4 GiB array
    per call (review finding, round 3). Functional check: output
    matches the python tokenizer on a long text."""
    from tests.helpers import make_tokenizer

    text = "green tea einstein " * 500
    assert native_tok.tokenize(text) == make_tokenizer().tokenize(text)


def test_native_fuzz_parity_with_python(native_tok):
    """Seeded fuzz: the C++ tokenizer must match the pure-python one
    id-for-id on adversarial mixed content -- ASCII words (fast path),
    unicode, punctuation runs, literal specials, digits, case, long
    words, odd whitespace. Guards the raw-ASCII/memo/memchr fast
    paths added in round 3."""
    import random

    from tests.helpers import make_tokenizer

    py = make_tokenizer()
    rng = random.Random(1234)
    pieces = [
        "tea", "Tea", "TEA", "relativity", "word01234", "a", "I",
        "runs", "running", "teaing", "x" * 120, "42", "3.14", "e=mc2",
        "[SEP]", "[CLS]", "[PAD]", "[UNK]", "[MASK]", "[sep]", "[foo]",
        "Gr\u00eben", "t\u00e8a", "\u6f22\u5b57", "\u4e2d\u6587",
        "na\u00efve", "\u00c5ngstr\u00f6m",
        "...", "!!!", "?!.", "-", "--", "a-b", "a.b.c", "it's",
        '"quoted"', "(paren)", "semi;colon", "", " ", "\u00a0",
        "\u2003", "\u200b", "word\u0000null", "\U0001f642",
        "h\u00e9llo",
    ]
    for trial in range(200):
        n = rng.randrange(1, 12)
        sep = rng.choice([" ", "  ", " \t ", "\n"])
        text = sep.join(rng.choice(pieces) for _ in range(n))
        for ml in (8, 32, 128):
            a = native_tok.encode(text, max_length=ml)
            b = py.encode(text, max_length=ml)
            assert a == b, (trial, ml, repr(text), a, b)
