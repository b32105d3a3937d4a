"""End-to-end trainer test: tiny dataset, few steps, checkpoint/resume."""
import dataclasses
import json

import numpy as np
import pytest

from tests.helpers import make_tokenizer, tiny_bert_config
from vsearch_tpu.data import BiEncoderDataset
from vsearch_tpu.retriever import Retriever, RetrieverConfig
from vsearch_tpu.train.trainer import RetrieverTrainer, TrainConfig


@pytest.fixture(scope="module")
def train_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("train")
    rows = []
    words = ["tea", "mars", "einstein", "dog", "river", "physics",
             "city", "water", "light", "planet"]
    for i in range(24):
        w = words[i % len(words)]
        rows.append({
            "question": f"what is {w}",
            "answers": [w],
            "positive_ctxs": [{"text": f"{w} is the answer about {w}",
                               "title": w}],
            "negative_ctxs": [],
            "hard_negative_ctxs": [
                {"text": f"unrelated passage number {i}"}],
        })
    p = d / "train.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return str(p), str(d)


def make_retriever():
    tok = make_tokenizer()
    enc = {
        "type": "vdr", "max_len": 24, "topk": 16, "shift_vocab_num": 5,
        **{k: v for k, v in vars(tiny_bert_config(tok.vocab_size)).items()
           if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size",
                    "max_position_embeddings")},
    }
    cfg = RetrieverConfig(encoder_q=dict(enc), encoder_p=dict(enc),
                          shared_encoder=True)
    return Retriever(cfg, tokenizer=tok)


def test_trainer_runs_and_loss_decreases(train_file, tmp_path):
    path, _ = train_file
    ds = BiEncoderDataset(path)
    retriever = make_retriever()
    cfg = TrainConfig(batch_size=8, num_train_epochs=3,
                      learning_rate=5e-4, num_warmup_epochs=1,
                      num_epoch_to_save=10, hard_negatives=1,
                      other_negatives=0, log_batch_step=100,
                      output_dir=str(tmp_path), seed=3)
    trainer = RetrieverTrainer(retriever, cfg, [ds])
    trainer.run_train()
    # after training, params must differ from init and embed must work
    assert int(trainer.state.step) == 3 * 3  # 24 samples / 8 = 3 per epoch
    trainer._sync_params_to_retriever()
    emb = retriever.encoder_q.embed(["what is tea"])
    assert np.isfinite(emb).all()


def test_trainer_checkpoint_resume(train_file, tmp_path):
    path, _ = train_file
    ds = BiEncoderDataset(path)
    retriever = make_retriever()
    cfg = TrainConfig(batch_size=8, num_train_epochs=2,
                      learning_rate=5e-4, num_epoch_to_save=1,
                      output_dir=str(tmp_path), seed=4)
    trainer = RetrieverTrainer(retriever, cfg, [ds])
    trainer.run_train()
    assert int(trainer.state.step) == 6

    # model checkpoints exist and load
    loaded = Retriever.from_pretrained(str(tmp_path / "checkpoint_2"))
    e1 = loaded.encoder_q.embed(["what is tea"])
    trainer._sync_params_to_retriever()
    e2 = retriever.encoder_q.embed(["what is tea"])
    np.testing.assert_allclose(e1, e2, rtol=1e-5, atol=1e-6)

    # full train-state checkpoint restores step count
    r2 = make_retriever()
    t2 = RetrieverTrainer(r2, cfg, [ds])
    t2._init_state(3)
    t2.state, meta = __import__(
        "vsearch_tpu.train.checkpoint", fromlist=["load_checkpoint"]
    ).load_checkpoint(str(tmp_path / "train_state"), t2.state)
    assert int(t2.state.step) == 6
    assert meta["epoch"] == 2


def test_run_train_resume_public_api(train_file, tmp_path):
    """Round-2 VERDICT repro: ``run_train(resume=True)`` crashed with
    FileNotFoundError (resume() resolved the model-only checkpoint_<n>
    dirs instead of the orbax train_state). Now: train with mid-epoch
    saves (save_steps), then a FRESH trainer resumes through the public
    API, replays exactly the remaining batches, and lands on the same
    final step count and parameters as the straight-through run."""
    path, _ = train_file
    cfg = TrainConfig(batch_size=8, num_train_epochs=2,
                      learning_rate=5e-4, num_epoch_to_save=10,
                      save_steps=2, output_dir=str(tmp_path), seed=9)

    # reference trajectory: a clean straight-through run
    r0 = make_retriever()
    t0 = RetrieverTrainer(
        r0, dataclasses.replace(cfg, output_dir=str(tmp_path / "ref")),
        [BiEncoderDataset(path)])
    t0.run_train()
    assert int(t0.state.step) == 6

    # crashed run: mid-epoch saves land at step 2 (epoch 1, offset 2)
    # and step 5 (epoch 2, offset 2); the process dies right after the
    # step-5 save, BEFORE the end-of-run save — the scenario mid-epoch
    # checkpoints exist for
    r1 = make_retriever()
    t1 = RetrieverTrainer(r1, cfg, [BiEncoderDataset(path)])
    # _step_fn is built inside run_train (by _init_state), so hook the
    # init to wrap the real step with the crash
    orig_init, calls = t1._init_state, {"n": 0}

    def init_and_arm(updates_per_epoch):
        orig_init(updates_per_epoch)
        orig_step = t1._step_fn

        def dying_step(state, batch, rng):
            if calls["n"] == 5:
                raise KeyboardInterrupt("simulated crash after step 5")
            calls["n"] += 1
            return orig_step(state, batch, rng)

        t1._step_fn = dying_step

    t1._init_state = init_and_arm
    with pytest.raises(KeyboardInterrupt):
        t1.run_train()

    # fresh trainer + public resume: restores step 5, replays only
    # epoch 2's last batch, matches the clean run exactly
    r2 = make_retriever()
    t2 = RetrieverTrainer(r2, cfg, [BiEncoderDataset(path)])
    t2.run_train(resume=True)
    assert t2.start_epoch == 1 and t2.start_batch == 2
    assert int(t2.state.step) == 6

    flat1 = jax_flatten(t0.state.params)
    flat2 = jax_flatten(t2.state.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    # a SECOND resume restores the completed run's end state (the new
    # unconditional final save) and replays nothing
    r3 = make_retriever()
    t3 = RetrieverTrainer(r3, cfg, [BiEncoderDataset(path)])
    t3.run_train(resume=True)
    assert t3.start_epoch == 2 and int(t3.state.step) == 6


def jax_flatten(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_run_train_resume_without_checkpoint_starts_fresh(train_file,
                                                          tmp_path):
    """resume=True on an empty output dir must start from scratch, not
    crash (the round-2 failure mode)."""
    path, _ = train_file
    cfg = TrainConfig(batch_size=8, num_train_epochs=1,
                      learning_rate=5e-4, num_epoch_to_save=10,
                      output_dir=str(tmp_path / "empty"), seed=10)
    t = RetrieverTrainer(make_retriever(), cfg,
                         [BiEncoderDataset(path)])
    t.run_train(resume=True)
    assert int(t.state.step) == 3


def test_trainer_ret_negatives(train_file, tmp_path):
    """Retrieved-negatives path: trainer mines negatives from a live
    index between steps (reference retriever.py:48-67)."""
    path, _ = train_file
    ds = BiEncoderDataset(path)
    retriever = make_retriever()
    corpus = [f"some passage about topic {i}" for i in range(10)]
    retriever.build_index(corpus, batch_size=4, index_type="dense")
    cfg = TrainConfig(batch_size=4, num_train_epochs=1,
                      learning_rate=5e-4, ret_negatives=1, ret_topk=5,
                      negative_pool_size=4, num_epoch_to_save=10,
                      output_dir=str(tmp_path), seed=5)
    trainer = RetrieverTrainer(retriever, cfg, [ds])
    trainer.run_train()
    assert int(trainer.state.step) == 6


def test_training_improves_retrieval(train_file, tmp_path):
    """Learning quality gate: after contrastive training, alpha search
    must rank each query's positive passage top-1 (the reference's only
    quality monitor is eyeballing InfoCard/acc@1 — this makes the
    'training actually learns retrieval' property a hard test)."""
    path, _ = train_file
    ds = BiEncoderDataset(path)
    retriever = make_retriever()
    corpus = [f"{w} is the answer about {w}"
              for w in ["tea", "mars", "einstein", "dog", "river"]]
    queries = [f"what is {w}"
               for w in ["tea", "mars", "einstein", "dog", "river"]]

    def top1_accuracy():
        retriever.build_index(corpus, index_type="sparse")
        res = retriever.retrieve(queries, k=1)
        return float(np.mean(np.asarray(res.ids)[:, 0]
                             == np.arange(len(queries))))

    cfg = TrainConfig(batch_size=8, num_train_epochs=60,
                      learning_rate=2e-3, num_warmup_epochs=2,
                      num_epoch_to_save=1000, hard_negatives=1,
                      other_negatives=0, log_batch_step=10000,
                      output_dir=str(tmp_path), seed=11)
    trainer = RetrieverTrainer(retriever, cfg, [ds])
    trainer.run_train()
    # (seeded baseline before training: 0.6 from raw lexical overlap)
    acc = top1_accuracy()
    assert acc == 1.0, f"trained top-1 accuracy {acc} < 1.0"


def test_checkpoint_atomicity_crash_windows(train_file, tmp_path):
    """A crash at any point of a train-state save must leave a
    resumable checkpoint: resolve_checkpoint_dir prefers the committed
    dir, then a complete .tmp, then the displaced .old."""
    import os
    import shutil

    from vsearch_tpu.train.checkpoint import (load_checkpoint,
                                              resolve_checkpoint_dir,
                                              save_checkpoint)

    path, _ = train_file
    cfg = TrainConfig(batch_size=8, num_train_epochs=1,
                      learning_rate=5e-4, num_epoch_to_save=1,
                      output_dir=str(tmp_path), seed=12)
    t = RetrieverTrainer(make_retriever(), cfg,
                         [BiEncoderDataset(path)])
    t.run_train()
    ckpt = str(tmp_path / "train_state")
    assert resolve_checkpoint_dir(ckpt) == os.path.abspath(ckpt)

    # crash AFTER the old dir was displaced but BEFORE the tmp rename:
    # only .tmp (complete) and .old exist
    save_checkpoint(ckpt, t.state, epoch=1, offset=2)
    os.rename(ckpt, ckpt + ".old")
    shutil.copytree(ckpt + ".old", ckpt + ".tmp")
    got = resolve_checkpoint_dir(ckpt)
    assert got == ckpt + ".tmp"
    t2 = RetrieverTrainer(make_retriever(), cfg,
                          [BiEncoderDataset(path)])
    t2._init_state(3)
    state, meta = load_checkpoint(got, t2.state)
    assert meta["epoch"] == 1 and meta["offset"] == 2

    # crash DURING the tmp write (incomplete tmp: meta missing): the
    # displaced .old must win
    shutil.rmtree(ckpt + ".tmp")
    os.makedirs(ckpt + ".tmp/state")
    assert resolve_checkpoint_dir(ckpt) == ckpt + ".old"

    # a fresh save on top of the debris commits cleanly again
    shutil.rmtree(ckpt + ".tmp")
    os.rename(ckpt + ".old", ckpt)
    save_checkpoint(ckpt, t.state, epoch=1, offset=3)
    assert resolve_checkpoint_dir(ckpt) == os.path.abspath(ckpt)
    _, meta = load_checkpoint(ckpt, t2.state)
    assert meta["offset"] == 3


def test_checkpoint_tmp_promoted_before_next_save(train_file, tmp_path):
    """After a crash between displacing the old dir and committing
    .tmp, the next save must PROMOTE the complete .tmp (the newest
    good checkpoint) instead of rmtree'ing it — a second crash during
    that save would otherwise fall back two generations (review
    finding, round 3)."""
    import os
    import shutil

    from vsearch_tpu.train.checkpoint import (load_checkpoint,
                                              resolve_checkpoint_dir,
                                              save_checkpoint)

    path, _ = train_file
    cfg = TrainConfig(batch_size=8, num_train_epochs=1,
                      learning_rate=5e-4, num_epoch_to_save=1,
                      output_dir=str(tmp_path), seed=13)
    t = RetrieverTrainer(make_retriever(), cfg,
                         [BiEncoderDataset(path)])
    t.run_train()
    ckpt = str(tmp_path / "train_state")

    # simulate the crash window: newest state lives ONLY in .tmp
    save_checkpoint(ckpt, t.state, epoch=1, offset=5)
    os.rename(ckpt, ckpt + ".tmp.displaced")
    shutil.move(ckpt + ".tmp.displaced", ckpt + ".tmp")
    assert resolve_checkpoint_dir(ckpt) == ckpt + ".tmp"

    # next save crashes mid-write (orbax save raises): the promoted
    # old state must survive at the committed path
    import vsearch_tpu.train.checkpoint as ckpt_mod

    class Boom(Exception):
        pass

    real_ocp = __import__("orbax.checkpoint", fromlist=["x"])

    class FailingCkptr:
        def save(self, *a, **k):
            raise Boom()

    orig = real_ocp.StandardCheckpointer
    real_ocp.StandardCheckpointer = FailingCkptr
    try:
        with pytest.raises(Boom):
            save_checkpoint(ckpt, t.state, epoch=2, offset=0)
    finally:
        real_ocp.StandardCheckpointer = orig

    got = resolve_checkpoint_dir(ckpt)
    assert got == os.path.abspath(ckpt)  # promoted, not destroyed
    t2 = RetrieverTrainer(make_retriever(), cfg,
                          [BiEncoderDataset(path)])
    t2._init_state(3)
    _, meta = load_checkpoint(got, t2.state)
    assert meta["epoch"] == 1 and meta["offset"] == 5


def test_shuffle_positives_flag_reaches_batching(train_file, tmp_path,
                                                 monkeypatch):
    """The data store's shuffle_positives knob must reach
    create_biencoder_batch — it was stored on the dataset but never
    read (review finding, round 3)."""
    import vsearch_tpu.train.trainer as trainer_mod

    path, _ = train_file
    ds = BiEncoderDataset(path, shuffle_positives=True)
    cfg = TrainConfig(batch_size=8, num_train_epochs=1,
                      learning_rate=5e-4, num_epoch_to_save=10,
                      prefetch_batches=0, output_dir=str(tmp_path),
                      seed=14)
    t = RetrieverTrainer(make_retriever(), cfg, [ds])
    seen = []
    orig = trainer_mod.create_biencoder_batch

    def spy(*a, **kw):
        seen.append(kw.get("shuffle_positives"))
        return orig(*a, **kw)

    monkeypatch.setattr(trainer_mod, "create_biencoder_batch", spy)
    t.run_train()
    assert seen and all(v is True for v in seen)
