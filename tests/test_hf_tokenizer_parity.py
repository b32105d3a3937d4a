"""Id-for-id parity of our WordPiece (python + C++) vs HF BertTokenizerFast.

The reference consumes HF ``AutoTokenizer`` (reference:
src/ir/encoder/vdr.py:51, retriever.py:234-247); our from-scratch
tokenizer must reproduce HF's BERT-uncased pipeline exactly — the whole
BoT index path rides on it. ``BertTokenizerFast`` built from a local
vocab file needs no network, so this suite is the ground-truth gate:
adversarial text (CJK, combining accents, emoji, 100+-char words,
control chars, punctuation runs) plus ~10k fuzzed strings.
"""
import random
import string

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from vsearch_tpu.tokenization.wordpiece import WordPieceTokenizer

MAXLEN = 48


def _rich_vocab():
    """Deterministic BERT-like vocab exercising every pipeline branch."""
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    toks += [f"[unused{i}]" for i in range(10)]
    chars = list(string.ascii_lowercase) + list(string.digits)
    toks += chars + [f"##{c}" for c in chars]
    toks += [c for c in string.punctuation]
    toks += list("中文漢字日本語水茶")  # some CJK known, rest unknown
    toks += list("αβγσςабвðþß")  # greek/cyrillic/icelandic letters
    toks += ["##σ", "##ς", "##β", "##б"]
    words = (
        "the a an of and to in is was for on that green tea drink likes "
        "who what where planet mars red surface water ice einstein wrote "
        "theory relativity famous paper running runs run fast slow city "
        "un ##able ##ing ##ed ##er ##est ##ly ##s ##y ##ness do ##es "
        "über straße naïve café résumé believ ##e play ##ground long "
        "##word token ##ize ##r pre ##fix suf ##f ##ix"
    ).split()
    out, seen = [], set()
    for t in toks + words:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("hfvocab") / "vocab.txt"
    p.write_text("\n".join(_rich_vocab()), encoding="utf-8")
    return str(p)


@pytest.fixture(scope="module")
def hf(vocab_file):
    return transformers.BertTokenizerFast(vocab_file=vocab_file,
                                          do_lower_case=True)


@pytest.fixture(scope="module")
def ours(vocab_file):
    return WordPieceTokenizer.from_vocab_file(vocab_file)


@pytest.fixture(scope="module")
def native(vocab_file):
    try:
        from vsearch_tpu.tokenization.native import (
            NativeWordPieceTokenizer)
        return NativeWordPieceTokenizer.from_vocab_file(vocab_file)
    except Exception as exc:  # pragma: no cover - g++ missing
        pytest.skip(f"native tokenizer unavailable: {exc}")


ADVERSARIAL = [
    "",
    " ",
    "\t\n\r  \t",
    "a",
    "A",
    "Green tea is a drink!",
    "GREEN TEA!!! ???",
    "the##ing",  # literal ## in text
    "##",
    "punct@@@only!!! ???...,,,;;;:::",
    "((()))[[[]]]{{{}}}",
    "word-with-hyphens and_under_scores",
    "un" + "a" * 120 + "ble",  # >100-char word -> [UNK]
    "a" * 99,
    "a" * 100,
    "a" * 101,
    "über Straße naïve café RÉSUMÉ",
    "café résumé",  # decomposed combining accents
    "İstanbul ıı IJssel",  # dotted capital I, dotless i
    "ß ẞ ﬁ ﬂ",  # sharp s, ligatures
    "中文 characters 漢字 mixed 日本語",
    "水茶 unknown CJK: 龍鳳龜麟",
    "中" * 60,
    "emoji 😀 test 🚀🔥 multi 👨‍👩‍👧‍👦 zwj",
    "zero​width‌join‍er",
    "null\x00byte and � replacement",
    "control\x01\x02\x03chars",
    "tab\tsep\nnewline\rcarriage",
    "  leading and trailing   ",
    "ideographic　space",
    "nbsp here",
    "mixed 中 abc 文 def!",
    "αβγ greek абв cyrillic",
    "ΑΣ ΣΙΓΜΑ ΟΔΥΣΣΕΥΣ τέλος ΑΒΓ",  # final-sigma context: fast gives σ
    "title [SEP] the body text",  # corpus join: literal special token
    "a[SEP]b [CLS] x [PAD][MASK] [UNK] end",
    "not [sep] special [SEPX] [ SEP ] [mask]",
    "Ð Þ ẞ ı İ Ĳssel ǄUNGLE",  # full-unicode lowercase beyond Latin-A",
    "ÅΩ angstrom ohm signs",
    "halfａｂwidth full",  # fullwidth latin
    "number 123,456.789 -42 +7e10",
    "'quotes' \"double\" `back` ''d",
    "x" + "".join(random.Random(0).choices("ab-c.d!e", k=200)),
    "the quick brown fox jumps over the lazy dog " * 8,  # truncation
    "ACCUMULATE accumulate AcCuMuLaTe",
]


def _hf_ids(hf, text, add_special=True):
    return hf.encode(text, add_special_tokens=add_special,
                     truncation=True, max_length=MAXLEN)


def test_adversarial_parity_python(hf, ours):
    for text in ADVERSARIAL:
        expect = _hf_ids(hf, text)
        got = ours.encode(text, max_length=MAXLEN)
        assert got == expect, (
            f"python mismatch on {text!r}:\n got {got}\n hf  {expect}\n"
            f" got toks {ours.convert_ids_to_tokens(got)}\n"
            f" hf  toks {hf.convert_ids_to_tokens(expect)}")


def test_adversarial_parity_no_specials(hf, ours):
    for text in ADVERSARIAL:
        expect = hf.encode(text, add_special_tokens=False,
                           truncation=True, max_length=MAXLEN)
        got = ours.encode(text, max_length=MAXLEN,
                          add_special_tokens=False)
        assert got == expect, f"no-specials mismatch on {text!r}"


def test_adversarial_parity_native(hf, native):
    got_all = native.encode_batch(ADVERSARIAL, max_length=MAXLEN)
    for text, got in zip(ADVERSARIAL, got_all):
        expect = _hf_ids(hf, text)
        assert got == expect, (
            f"native mismatch on {text!r}:\n got {got}\n hf  {expect}")


def _fuzz_corpus(n):
    rng = random.Random(1234)
    alphabet = (
        list(string.ascii_letters) * 6 + list(string.digits) * 2 +
        list(string.punctuation) + list(" " * 12 + "\t\n") +
        list("中文漢字水茶龍έαβγабвюя") + list("éàüßñḉ̈") +
        ["😀", "🚀", "​", " ", "　", "\x00", "�"])
    words = ("the green tea drink planet mars running über naïve "
             "relativity token").split()
    out = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(0, 12)):
            if rng.random() < 0.3:
                parts.append(rng.choice(words))
            else:
                parts.append("".join(
                    rng.choices(alphabet, k=rng.randint(1, 12))))
        out.append(" ".join(parts))
    return out


def test_fuzz_parity(hf, ours, native):
    texts = _fuzz_corpus(10000)
    expect_all = hf(texts, add_special_tokens=True, truncation=True,
                    max_length=MAXLEN)["input_ids"]
    native_all = native.encode_batch(texts, max_length=MAXLEN)
    mismatch_py = mismatch_nat = 0
    first = None
    for i, text in enumerate(texts):
        if native_all[i] != expect_all[i]:
            mismatch_nat += 1
            first = first or ("native", text, native_all[i],
                              expect_all[i])
    # python path is slower: spot-check a deterministic 1k subset
    for i in range(0, len(texts), 10):
        if ours.encode(texts[i], max_length=MAXLEN) != expect_all[i]:
            mismatch_py += 1
            first = first or ("python", texts[i], None, expect_all[i])
    assert mismatch_py == 0 and mismatch_nat == 0, (
        f"py={mismatch_py} nat={mismatch_nat}; first: {first!r}")


def test_bot_rows_match_hf(hf, native):
    """encode_bot_batch == first-N-unique of HF ids >= shift, shifted.

    Mirrors the reference BoT build (reference: src/ir/retriever/
    retriever.py:234-247 — HF ids, dedup, vocab shift).
    """
    shift, cap, nnz_pad = 15, 64, 96
    texts = [t for t in ADVERSARIAL if t.strip()]
    cols, nnz = native.encode_bot_batch(texts, max_len=MAXLEN,
                                        shift=shift, cap=cap,
                                        nnz_pad=nnz_pad)
    for i, text in enumerate(texts):
        ids = _hf_ids(hf, text)
        seen = {}
        for tid in ids:
            if tid >= shift and tid not in seen:
                seen[tid] = None
                if len(seen) >= cap:
                    break
        expect = [tid - shift for tid in seen]
        assert cols[i, : nnz[i]].tolist() == expect, (
            f"BoT mismatch on {text!r}")
    assert (nnz >= 0).all()
