"""Worker process for the multi-host smoke test (spawned by
test_multihost.py). Two processes form one 4-device CPU mesh and run one
shared training step; both must compute identical global loss."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

PID = int(sys.argv[1])
PORT = sys.argv[2]

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from vsearch_tpu.parallel.collectives import initialize_distributed  # noqa

assert initialize_distributed(coordinator_address=f"127.0.0.1:{PORT}",
                              num_processes=2, process_id=PID)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from helpers import make_tokenizer, tiny_bert_config  # noqa: E402
from vsearch_tpu.models.vdr import VDREncoderConfig, VDRModule  # noqa
from vsearch_tpu.parallel.mesh import make_mesh  # noqa: E402
from vsearch_tpu.train.loss import VDRLossConfig  # noqa: E402
from vsearch_tpu.train.optim import get_optimizer  # noqa: E402
from vsearch_tpu.train.step import (TrainBatch, TrainState,  # noqa
                                    TrainStepConfig, make_encoder_apply,
                                    make_train_step)

assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 local x 2 processes

tok = make_tokenizer()
cfg = VDREncoderConfig(bert=tiny_bert_config(tok.vocab_size),
                       shift_vocab_num=5, max_len=16, topk=8)
module = VDRModule(cfg)
params = module.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 8), jnp.int32),
                     jnp.zeros((1, 8), jnp.int32),
                     jnp.ones((1, 8), jnp.int32))["params"]

mesh = make_mesh(dp=4, tp=1)
step_cfg = TrainStepConfig(encoder_type="vdr",
                           vocab_size=cfg.vocab_size,
                           shift_vocab_num=cfg.shift_vocab_num,
                           loss=VDRLossConfig(topk=8))
apply = make_encoder_apply(module, deterministic=True)
tx = get_optimizer(params, learning_rate=1e-3)
state = TrainState.create(params, tx)
step = make_train_step(apply, apply, step_cfg, mesh=mesh,
                       shared_params=True)

# deterministic global batch; every process materializes the full array
# and hands jax its shards via make_array_from_process_local_data
rng = np.random.default_rng(7)
N = 8
q_np = rng.integers(5, cfg.vocab_size, size=(N, 12)).astype(np.int32)
p_np = rng.integers(5, cfg.vocab_size, size=(2 * N, 12)).astype(np.int32)

from jax.experimental import multihost_utils

sh = NamedSharding(mesh, P("dp"))
batch = TrainBatch(
    q_ids=multihost_utils.host_local_array_to_global_array(
        q_np, mesh, P("dp")) if False else
    jax.make_array_from_callback(
        q_np.shape, sh, lambda idx: q_np[idx]),
    p_ids=jax.make_array_from_callback(
        p_np.shape, sh, lambda idx: p_np[idx]),
)
with mesh:
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
loss = float(metrics["loss"])
print(f"RESULT pid={PID} loss={loss:.6f}", flush=True)

# ---- sharded bit-packed search across the same 2-process mesh ---------
from vsearch_tpu.ops.bitpack import ROW_BLOCK, BitMatrix, pack_dense
from vsearch_tpu.parallel.sharded_search import make_sharded_bitpack_search

rng2 = np.random.default_rng(11)
dense = (rng2.random((300, 200)) < 0.12).astype(np.float32)
q_search = np.abs(rng2.normal(size=(3, 200))).astype(np.float32)

words_local = np.asarray(pack_dense(dense).words)  # [1024, W]
shards = 4
words_np = np.zeros((shards * ROW_BLOCK, words_local.shape[1]),
                    np.uint32)
words_np[: words_local.shape[0]] = words_local

sh_rows = NamedSharding(mesh, P("dp", None))
sh_rep = NamedSharding(mesh, P())
bm = BitMatrix(
    words=jax.make_array_from_callback(
        words_np.shape, sh_rows, lambda idx: words_np[idx]),
    num_rows=300, num_cols=200)
qg = jax.make_array_from_callback(q_search.shape, sh_rep,
                                  lambda idx: q_search[idx])
search = make_sharded_bitpack_search(mesh, k=6, bitmat=bm)
ids, scores = search(qg, bm)
ids = np.asarray(jax.device_get(ids))
scores = np.asarray(jax.device_get(scores))
print(f"SEARCH pid={PID} ids={ids.tolist()} "
      f"scores={np.round(scores, 3).tolist()}", flush=True)

# ---- the REAL RetrieverTrainer across the 2-process mesh --------------
# (round-2 gap: only the hand-rolled step above was multi-process
# validated; this drives RetrieverTrainer.run_train end to end with
# process-sharded input + make_array_from_process_local_data batches)
import json
import tempfile

from vsearch_tpu.data import BiEncoderDataset
from vsearch_tpu.retriever import Retriever, RetrieverConfig
from vsearch_tpu.train.trainer import RetrieverTrainer, TrainConfig

words = ["tea", "mars", "einstein", "dog", "river", "physics",
         "city", "water", "light", "planet"]
rows = []
for i in range(16):
    w = words[i % len(words)]
    rows.append({
        "question": f"what is {w}",
        "answers": [w],
        "positive_ctxs": [{"text": f"{w} is the answer about {w}",
                           "title": w}],
        "negative_ctxs": [],
        "hard_negative_ctxs": [{"text": f"unrelated passage {i}"}],
    })
# the output dir must be SHARED across processes: checkpoint saves
# (including run_train's final save) are orbax collectives, and
# per-process paths would deadlock the barrier. Keyed by PORT so
# concurrent test runs don't collide; the data file stays per-PID.
workdir = os.path.join(tempfile.gettempdir(), f"mh_trainer_{PORT}")
os.makedirs(workdir, exist_ok=True)
train_file = os.path.join(workdir, f"train_{PID}.jsonl")
with open(train_file, "w") as f:
    f.write("\n".join(json.dumps(r) for r in rows) + "\n")

enc = {
    "type": "vdr", "max_len": 16, "topk": 8, "shift_vocab_num": 5,
    **{k: v for k, v in vars(tiny_bert_config(tok.vocab_size)).items()
       if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                "num_attention_heads", "intermediate_size",
                "max_position_embeddings")},
}
rcfg = RetrieverConfig(encoder_q=dict(enc), encoder_p=dict(enc),
                       shared_encoder=True)
retriever = Retriever(rcfg, tokenizer=tok)
tcfg = TrainConfig(batch_size=4, num_train_epochs=2,
                   learning_rate=5e-4, num_epoch_to_save=100,
                   log_batch_step=1000, prefetch_batches=0,
                   output_dir=workdir, seed=6)
trainer = RetrieverTrainer(retriever, tcfg, [BiEncoderDataset(train_file)],
                           mesh=mesh)
# per-process shard: 8 of 16 samples -> 2 iterations/epoch, global
# batch 8 rows over the 4-device mesh
assert trainer._build_iterator().get_max_iterations() == 2
trainer.run_train()
leaves = jax.tree_util.tree_leaves(trainer.state.params)
checksum = float(sum(float(jnp.sum(jnp.abs(x))) for x in leaves))
print(f"TRAINER pid={PID} step={int(trainer.state.step)} "
      f"checksum={checksum:.6f}", flush=True)
