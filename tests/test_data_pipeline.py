"""Data pipeline tests: jsonl loading, deterministic sharded iteration,
resume offsets, multi-set interleaving, batch creation layout."""
import json
import random

import numpy as np
import pytest

from tests.helpers import make_tokenizer
from vsearch_tpu.data import (
    BiEncoderBatch,
    BiEncoderDataset,
    BiEncoderSample,
    BiEncoderPassage,
    MultiSetDataIterator,
    ShardedDataIterator,
    create_biencoder_batch,
)


def write_jsonl(path, n, with_hard_negs=True):
    rows = []
    for i in range(n):
        rows.append({
            "question": f"question number {i}",
            "answers": [f"answer {i}"],
            "positive_ctxs": [{"text": f"positive passage {i}",
                               "title": f"title {i}"}],
            "negative_ctxs": [{"text": f"negative {i} a"},
                              {"text": f"negative {i} b"}],
            "hard_negative_ctxs": (
                [{"text": f"hard negative {i}"}] if with_hard_negs else []),
        })
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return rows


def test_dataset_load_and_filter(tmp_path):
    p = tmp_path / "train.jsonl"
    write_jsonl(p, 5)
    # one sample without hard negatives gets filtered when required
    with p.open("a") as f:
        f.write(json.dumps({"question": "q", "answers": ["a"],
                            "positive_ctxs": [{"text": "t"}],
                            "negative_ctxs": [],
                            "hard_negative_ctxs": []}) + "\n")
    ds = BiEncoderDataset(str(p))
    ds.load_data(require_positive=True, require_hard_negative=True)
    assert len(ds) == 5
    ds2 = BiEncoderDataset(str(p))
    ds2.load_data(require_positive=True, require_hard_negative=False)
    assert len(ds2) == 6
    s = ds[0]
    assert isinstance(s, BiEncoderSample)
    assert s.positive_passages[0].title == "title 0"


class ListDataset(list):
    pass


def test_sharded_iterator_covers_and_is_deterministic():
    ds = ListDataset(range(20))
    it_a = ShardedDataIterator(ds, shard_id=0, num_shards=2, batch_size=3,
                               shuffle_seed=7)
    it_b = ShardedDataIterator(ds, shard_id=1, num_shards=2, batch_size=3,
                               shuffle_seed=7)
    a_items = [x for batch in it_a.iterate_ds_data(epoch=0) for x in batch]
    b_items = [x for batch in it_b.iterate_ds_data(epoch=0) for x in batch]
    # shards are disjoint
    assert not (set(a_items) & set(b_items))
    assert it_a.max_iterations == it_b.max_iterations == 3
    # deterministic across re-instantiations
    it_a2 = ShardedDataIterator(ds, shard_id=0, num_shards=2, batch_size=3,
                                shuffle_seed=7)
    a2 = [x for batch in it_a2.iterate_ds_data(epoch=0) for x in batch]
    assert a_items == a2
    # different epoch -> different permutation
    it_a3 = ShardedDataIterator(ds, shard_id=0, num_shards=2, batch_size=3,
                                shuffle_seed=7)
    a3 = [x for b in it_a3.iterate_ds_data(epoch=1) for x in b]
    assert a_items != a3


def test_sharded_iterator_resume_offset():
    ds = ListDataset(range(12))
    full = ShardedDataIterator(ds, batch_size=2, shuffle_seed=3)
    batches = list(full.iterate_ds_data(epoch=0))
    resumed = ShardedDataIterator(ds, batch_size=2, shuffle_seed=3,
                                  offset=2)
    rbatches = list(resumed.iterate_ds_data(epoch=0))
    assert rbatches == batches[2:]


def test_short_shard_pads_from_head():
    ds = ListDataset(range(10))  # shards of 5; batch 2 -> 3 iters (ceil)
    it = ShardedDataIterator(ds, shard_id=1, num_shards=3, batch_size=2)
    batches = list(it.iterate_ds_data(epoch=0))
    assert len(batches) == it.max_iterations


def test_multiset_iterator_schedule():
    ds1 = ListDataset(range(8))
    ds2 = ListDataset([chr(ord("a") + i) for i in range(16)])
    it1 = ShardedDataIterator(ds1, batch_size=2, shuffle_seed=5)
    it2 = ShardedDataIterator(ds2, batch_size=2, shuffle_seed=5)
    multi = MultiSetDataIterator([it1, it2], shuffle_seed=5)
    out = list(multi.iterate_ds_data(epoch=0))
    assert len(out) == multi.max_iterations == 4 + 8
    # each batch comes from exactly one source
    for batch, src in out:
        if src == 0:
            assert all(isinstance(x, int) for x in batch)
        else:
            assert all(isinstance(x, str) for x in batch)
    # deterministic schedule
    multi2 = MultiSetDataIterator(
        [ShardedDataIterator(ds1, batch_size=2, shuffle_seed=5),
         ShardedDataIterator(ds2, batch_size=2, shuffle_seed=5)],
        shuffle_seed=5)
    assert [src for _, src in multi2.iterate_ds_data(epoch=0)] == [
        src for _, src in out]


def test_create_biencoder_batch_layout():
    tok = make_tokenizer()
    samples = [
        BiEncoderSample(
            query=f"question {i}",
            answers=[f"answer {i}"],
            positive_passages=[BiEncoderPassage(f"positive {i}", "t")],
            negative_passages=[BiEncoderPassage(f"negative {i} a"),
                               BiEncoderPassage(f"negative {i} b")],
            hard_negative_passages=[BiEncoderPassage(f"hard {i}")],
        )
        for i in range(4)
    ]
    batch = create_biencoder_batch(
        tok, tok, samples, q_max_len=16, p_max_len=16,
        num_hard_negatives=1, num_other_negatives=1,
        shuffle=False, rng=random.Random(0))
    assert batch.q_tensor.shape == (4, 16)
    # [N positives] + [N*2 negatives]
    assert batch.p_tensor.shape == (12, 16)
    assert batch.q_tensor.dtype == np.int32
    # positive rows decode back to the positive passages
    for i in range(4):
        decoded = tok.decode(batch.p_tensor[i])
        assert f"positive {i}" in decoded
    # negatives follow sample-major
    assert len(batch.p_texts) == 12
    assert batch.p_texts[4].startswith("negative 0")


def test_rag_dataset(tmp_path):
    from vsearch_tpu.data.rag_dataset import RAGDataset

    rows = [
        {"question": "who made relativity",
         "answers": ["einstein"],
         "ctxs": [{"text": "einstein proposed relativity", "title": "a"},
                  {"text": "the cat sat on the mat", "title": "b"}]},
        {"question": "no positives here",
         "answers": ["zzz"],
         "ctxs": [{"text": "irrelevant text"}]},
    ]
    import json as _json
    p = tmp_path / "rag.jsonl"
    p.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
    ds = RAGDataset(str(p))
    ds.load_data(require_positive=True)
    assert len(ds) == 1
    s = ds[0]
    assert s.positive_passages[0].text.startswith("einstein")
    assert len(s.negative_passages) == 1
    ds2 = RAGDataset(str(p))
    ds2.load_data(require_positive=False)
    assert len(ds2) == 2


def test_multiset_mid_epoch_resume_property():
    """Property: for ANY (datasets, shards, batch size, rates, offset,
    epoch), a MultiSet iterator armed with a mid-epoch offset yields
    exactly the straight-through run's remaining batches — and the next
    epoch starts at 0 (the offset is one-shot). This is the contract
    run_train(resume=True) rides on."""
    rng = __import__("numpy").random.default_rng(123)
    for trial in range(30):
        n_sets = int(rng.integers(1, 4))
        sizes = [int(rng.integers(4, 40)) for _ in range(n_sets)]
        bs = int(rng.integers(1, 5))
        shards = int(rng.integers(1, 3))
        shard_id = int(rng.integers(0, shards))
        seed = int(rng.integers(0, 1000))
        epoch = int(rng.integers(0, 4))
        rates = ([float(rng.choice([0.5, 1.0]))
                  for _ in range(n_sets)]
                 if rng.random() < 0.5 else None)

        def build():
            its = [ShardedDataIterator(
                ListDataset(range(k * 1000, k * 1000 + sz)),
                shard_id=shard_id, num_shards=shards, batch_size=bs,
                shuffle_seed=seed) for k, sz in enumerate(sizes)]
            return MultiSetDataIterator(its, shuffle_seed=seed,
                                        sampling_rates=rates)

        ref = build()
        full = list(ref.iterate_ds_data(epoch=epoch))
        if not full:
            continue
        offset = int(rng.integers(0, len(full) + 1))
        res = build()
        res.set_start_iteration(offset)
        resumed = list(res.iterate_ds_data(epoch=epoch))
        assert resumed == full[offset:], (
            trial, sizes, bs, shards, shard_id, seed, epoch, rates,
            offset)
        # one-shot: the next epoch replays in full
        nxt = list(res.iterate_ds_data(epoch=epoch + 1))
        ref2 = build()
        assert nxt == list(ref2.iterate_ds_data(epoch=epoch + 1))


def test_local_shards_load_disjoint_slices(tmp_path):
    """local_shards=True must give every shard a DISJOINT slice of the
    file, parsed shard-locally — the reference factory full-loaded
    every dataset and never invoked the local load, so all shards
    iterated the same head slice (review finding, round 3; reference
    ddp_iterators.py:132-146 intent)."""
    from vsearch_tpu.data import BiEncoderDataset, get_data_iterator

    p = tmp_path / "train.jsonl"
    write_jsonl(p, 16)
    seen = {}
    for shard in range(2):
        ds = BiEncoderDataset(str(p))
        it = get_data_iterator([ds], batch_size=2, shuffle=False,
                               num_shards=2, shard_id=shard,
                               local_shards=True)
        qs = set()
        for batch, _src in it.iterate_ds_data(epoch=0):
            qs.update(s.query for s in batch)
        # the local dataset holds only this shard's rows
        assert len(ds) == 8
        seen[shard] = qs
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == 16


def test_eval_iterator_covers_all_datasets(tmp_path):
    """is_train_set=False with several datasets must iterate ALL of
    them — the reference passed the literal [1] as sampling_rates,
    which zip-truncated the quota list to one dataset (review finding,
    round 3)."""
    from vsearch_tpu.data import BiEncoderDataset, get_data_iterator

    paths = []
    for d in range(3):
        p = tmp_path / f"dev{d}.jsonl"
        write_jsonl(p, 4)
        paths.append(p)
    dss = [BiEncoderDataset(str(p)) for p in paths]
    it = get_data_iterator(dss, batch_size=2, is_train_set=False,
                           shuffle=False)
    sources = [src for _b, src in it.iterate_ds_data(epoch=0)]
    assert set(sources) == {0, 1, 2}
    assert len(sources) == 6  # 3 datasets x 2 batches each


def test_string_answer_field_wrapped(tmp_path):
    """A bare-string 'answer' must become a one-element list; iterating
    a string would make has_answer match single characters (review
    finding, round 3)."""
    from vsearch_tpu.data import BiEncoderDataset

    p = tmp_path / "str_ans.jsonl"
    p.write_text(json.dumps({
        "question": "who", "answer": "einstein",
        "positive_ctxs": [{"text": "einstein wrote it"}],
        "hard_negative_ctxs": [{"text": "x"}]}) + "\n")
    ds = BiEncoderDataset(str(p))
    ds.load_data()
    assert ds[0].answers == ["einstein"]


def test_negless_sample_pads_from_donor_pools():
    """A sample with no negatives pads from OTHER samples' negative
    pools — any in-batch positive as filler duplicates a softmax
    target row and pushes the gradient against that query's own
    positive (review finding, round 3)."""
    from vsearch_tpu.data.dataset import (BiEncoderPassage,
                                          BiEncoderSample)

    tok = make_tokenizer()
    mk = lambda t: BiEncoderPassage(text=t, title="")
    s_with = BiEncoderSample(
        query="q0", answers=[], positive_passages=[mk("pos zero")],
        negative_passages=[mk("neg a"), mk("neg b")],
        hard_negative_passages=[mk("hard a")])
    s_without = BiEncoderSample(
        query="q1", answers=[], positive_passages=[mk("pos one")],
        negative_passages=[], hard_negative_passages=[])
    b = create_biencoder_batch(tok, tok, [s_with, s_without],
                               q_max_len=16, p_max_len=16,
                               num_hard_negatives=1,
                               num_other_negatives=1, shuffle=False)
    positives = {"pos zero", "pos one"}
    # negatives block must contain no batch positive
    assert not positives & set(b.p_texts[2:] if hasattr(b, "p_texts")
                               else [])
    neg_texts = b.p_texts[2:] if len(b.p_texts) > 2 else []
    assert all(t not in positives for t in neg_texts)


def test_rag_dataset_skips_malformed_rows(tmp_path):
    """One foreign-schema jsonl row must be skipped with a warning, not
    abort the whole load (review finding, round 3); RAGDataset also
    supports local-shard geometry."""
    from vsearch_tpu.data.rag_dataset import RAGDataset

    p = tmp_path / "rag.jsonl"
    rows = [
        json.dumps({"q": "wrong key", "ctxs": []}),
        json.dumps({"question": "who", "answers": ["einstein"],
                    "ctxs": [{"text": "einstein wrote it",
                              "has_answer": True},
                             {"text": "a dog", "has_answer": False}]}),
    ]
    p.write_text("\n".join(rows) + "\n")
    ds = RAGDataset(str(p))
    assert ds.calc_total_data_len() == 2
    ds.load_data()
    assert len(ds) == 1  # malformed row skipped, good row kept
