"""Rich-token API (RichTokens / SpacyTokenizer / SimpleTokenizer) and
answer-matching behavior, incl. parity of the derived views (ngrams,
entity_groups, untokenize) against the reference's OWN Tokens class
(reference src/ir/utils/qa_utils.py:15-131) executed on identical data.
"""
import pytest

from vsearch_tpu.eval.qa_utils import (RichToken, RichTokens,
                                       SimpleTokenizer, has_answer)

TEXT = "Dr. Watson, meet Sherlock Holmes -- the detective (retired)."


def test_rich_tokenize_roundtrip_and_spans():
    rt = SimpleTokenizer().rich_tokenize(TEXT)
    assert rt.untokenize() == TEXT.strip()
    for tok in rt.tokens:
        s, e = tok.span
        assert TEXT[s:e] == tok.text
    assert rt.words(uncased=True)[0] == "dr"
    assert rt.slice(0, 2).words() == rt.words()[:2]
    assert len(rt.slice(3)) == len(rt) - 3


def test_ngrams_shapes():
    rt = SimpleTokenizer().rich_tokenize("a b c")
    assert rt.ngrams(n=2) == ["a", "a b", "b", "b c", "c"]
    assert rt.ngrams(n=1, as_strings=False) == [(0, 1), (1, 2), (2, 3)]
    # filter_fn drops matching grams
    assert rt.ngrams(n=1, filter_fn=lambda g: g == ["b"]) == ["a", "c"]


def _mk_pair():
    """Same annotated token stream as our RichTokens and the
    reference's tuple-based Tokens."""
    rows = [
        ("Ada", "Ada ", (0, 3), "NNP", "ada", "PERSON"),
        ("Lovelace", "Lovelace ", (4, 12), "NNP", "lovelace", "PERSON"),
        ("wrote", "wrote ", (13, 18), "VBD", "write", "O"),
        ("programs", "programs", (19, 27), "NNS", "program", "O"),
    ]
    ours = RichTokens(
        [RichToken(*r) for r in rows], annotators={"pos", "lemma", "ner"})
    return rows, ours


def test_entity_groups_and_annotations():
    _, rt = _mk_pair()
    assert rt.pos() == ["NNP", "NNP", "VBD", "NNS"]
    assert rt.lemmas() == ["ada", "lovelace", "write", "program"]
    assert rt.entity_groups() == [("Ada Lovelace", "PERSON")]
    # annotators gate the views, like the reference's Tokens
    bare = RichTokens(rt.tokens, annotators=())
    assert bare.pos() is None and bare.entities() is None


def test_rich_tokens_parity_vs_reference_tokens():
    """Execute the reference's Tokens on the same data: every derived
    view must agree (reference qa_utils.py:15-131)."""
    from tests.test_reference_parity import (_import_reference_vdr,
                                             remove_reference_stubs)

    _import_reference_vdr()  # stubs spacy/etc + sys.path for src.*
    try:
        import importlib

        ref_qa = importlib.import_module("src.ir.utils.qa_utils")
        rows, ours = _mk_pair()
        theirs = ref_qa.Tokens([list(r) for r in rows],
                               annotators={"pos", "lemma", "ner"})
        assert ours.words() == theirs.words()
        assert ours.words(True) == theirs.words(True)
        assert ours.offsets() == theirs.offsets()
        assert ours.pos() == theirs.pos()
        assert ours.lemmas() == theirs.lemmas()
        assert ours.entities() == theirs.entities()
        assert ours.untokenize() == theirs.untokenize()
        for n in (1, 2, 3):
            assert ours.ngrams(n=n) == theirs.ngrams(n=n)
            assert (ours.ngrams(n=n, uncased=True)
                    == theirs.ngrams(n=n, uncased=True))
        assert ours.entity_groups() == theirs.entity_groups()
        # our SimpleTokenizer vs the reference's on raw text
        ref_simple = ref_qa.SimpleTokenizer()
        ours_rt = SimpleTokenizer().rich_tokenize(TEXT)
        theirs_rt = ref_simple.tokenize(TEXT)
        assert ours_rt.words(True) == theirs_rt.words(True)
        assert ours_rt.offsets() == theirs_rt.offsets()
        assert ours_rt.untokenize() == theirs_rt.untokenize()
    finally:
        remove_reference_stubs()


def test_spacy_tokenizer_gated():
    """Without the optional spacy package the constructor must raise a
    clear ImportError (none of the shipped pipelines need it)."""
    pytest.importorskip  # (spacy may exist in other envs)
    try:
        import spacy  # noqa: F401
        pytest.skip("spacy installed here; gating path not reachable")
    except ImportError:
        pass
    from vsearch_tpu.eval.qa_utils import SpacyTokenizer

    with pytest.raises(ImportError, match="spacy"):
        SpacyTokenizer()


def test_has_answer_uses_token_spans():
    assert has_answer(["sherlock holmes"], TEXT)
    assert not has_answer(["lock hol"], TEXT)  # substring, not a span
    assert has_answer(["det.*ive"], TEXT, match_type="regex")
