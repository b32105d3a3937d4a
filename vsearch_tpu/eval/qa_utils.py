"""QA evaluation utilities: answer-span matching and qa.csv parsing.

Functional counterpart of the reference's DrQA-derived helpers
(reference: src/ir/utils/qa_utils.py:150-301): a unicode word tokenizer
and token-level answer containment used both for retrieval accuracy
scoring and for filtering false negatives during negative mining.
Re-implemented compactly; behavior matches (normalized, uncased,
token-span equality).
"""
from __future__ import annotations

import csv
import re
import unicodedata
from typing import List, Sequence, Tuple

try:
    import regex as _regex

    _WORD_RE = _regex.compile(
        r"([\p{L}\p{N}\p{M}]+)|([^\p{Z}\p{C}])",
        flags=_regex.IGNORECASE | _regex.UNICODE | _regex.MULTILINE)
except ImportError:  # pragma: no cover - regex is a hard dep of tests
    _regex = None
    _WORD_RE = re.compile(r"(\w+)|([^\s])", flags=re.UNICODE | re.MULTILINE)


class SimpleTokenizer:
    """Word tokenizer splitting into alphanumeric runs + single
    non-space symbols (reference qa_utils.py:150-192)."""

    def tokenize(self, text: str) -> List[str]:
        return [m.group() for m in _WORD_RE.finditer(text)]

    def words(self, text: str, uncased: bool = False) -> List[str]:
        toks = self.tokenize(text)
        return [t.lower() for t in toks] if uncased else toks


_TOKENIZER = SimpleTokenizer()


def _normalize(text: str) -> str:
    text = text.replace("’", "'").replace("\n", " ")
    return unicodedata.normalize("NFD", text)


def regex_match(text: str, pattern: str) -> bool:
    """True if ``pattern`` (case-insensitive regex) occurs in ``text``
    (reference qa_utils.py:248-254)."""
    eng = _regex or re
    try:
        compiled = eng.compile(
            pattern, flags=eng.IGNORECASE | eng.UNICODE | eng.MULTILINE)
    except BaseException:
        return False
    return compiled.search(text) is not None


def has_answer(answers: Sequence[str], text: str,
               match_type: str = "string") -> bool:
    """True if any answer occurs in ``text`` as a token span (or regex)
    (reference qa_utils.py:258-291)."""
    text = _normalize(text)
    if match_type == "string":
        words = _TOKENIZER.words(text, uncased=True)
        for ans in answers:
            ans_words = _TOKENIZER.words(_normalize(ans), uncased=True)
            n = len(ans_words)
            if n == 0:
                continue
            for i in range(0, len(words) - n + 1):
                if ans_words == words[i: i + n]:
                    return True
    elif match_type == "regex":
        for ans in answers:
            if regex_match(text, _normalize(ans)):
                return True
    return False


def parse_qa_csv_file(location: str) -> List[Tuple[str, List[str]]]:
    """Parse DPR-style qa.csv (TSV: question \\t "['a1','a2']")
    (reference qa_utils.py:293-301) — uses ast.literal_eval, not eval."""
    import ast

    res = []
    with open(location, encoding="utf-8") as f:
        for row in csv.reader(f, delimiter="\t"):
            if not row:
                continue
            question = row[0]
            answers = ast.literal_eval(row[1]) if len(row) > 1 else []
            res.append((question, list(answers)))
    return res
