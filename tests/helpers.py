"""Shared test helpers: synthetic vocab + tiny encoders."""
import os
import tempfile

import numpy as np

from vsearch_tpu.models.bert import BertConfig
from vsearch_tpu.tokenization.wordpiece import WordPieceTokenizer

# a small, deterministic english-ish vocab
_WORDS = [
    "the", "a", "of", "and", "to", "in", "is", "was", "for", "on", "that",
    "what", "who", "where", "when", "why", "how", "many", "much", "tea",
    "green", "who", "likes", "drink", "planet", "mars", "red", "surface",
    "water", "ice", "einstein", "theory", "relativity", "physics", "space",
    "time", "light", "speed", "paper", "wrote", "famous", "scientist",
    "passage", "query", "search", "index", "token", "sparse", "dense",
    "dog", "cat", "runs", "fast", "slow", "big", "small", "city", "river",
]
_SUBWORDS = ["##s", "##ing", "##ed", "##er", "##est", "##ly", "##y"]
_CHARS = list("abcdefghijklmnopqrstuvwxyz0123456789")


def make_vocab(shift_pad: int = 0):
    """Vocab layout mirroring BERT: specials first, then (optionally) some
    filler slots standing in for the shifted unused region, then words."""
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "[MASK]": 4}
    for i in range(shift_pad):
        vocab[f"[unused{i}]"] = len(vocab)
    punct = list(",.!?;:'\"()-")
    for tok in _CHARS + [f"##{c}" for c in _CHARS] + _SUBWORDS + punct:
        if tok not in vocab:
            vocab[tok] = len(vocab)
    seen = set(vocab)
    for w in _WORDS:
        if w not in seen:
            vocab[w] = len(vocab)
            seen.add(w)
    return vocab


def make_tokenizer(shift_pad: int = 0) -> WordPieceTokenizer:
    return WordPieceTokenizer(make_vocab(shift_pad))


def tiny_bert_config(vocab_size: int) -> BertConfig:
    return BertConfig(vocab_size=vocab_size, hidden_size=32,
                      num_hidden_layers=2, num_attention_heads=2,
                      intermediate_size=64, max_position_embeddings=64)
