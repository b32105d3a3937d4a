"""Multi-host smoke test: 2 jax processes form one mesh and run one
training step; both compute the same global loss.

This is the TPU-pod-shaped validation (jax.distributed + cross-process
mesh) that the single-process 8-device tests can't cover.
"""
import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step():
    port = str(_free_port())
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    losses = []
    for out in outs:
        m = re.search(r"RESULT pid=\d loss=([0-9.]+)", out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)


@pytest.mark.slow
def test_two_process_outputs_include_matching_sharded_search():
    """Runs with test_two_process_train_step's workers: the worker also
    executes a cross-process sharded bit-packed search; both processes
    must print identical global top-k, and the scores must match an
    exact numpy reference."""
    import numpy as np

    port = str(_free_port())
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    lines = []
    for out in outs:
        m = re.search(r"SEARCH pid=\d (ids=.*)", out)
        assert m, out[-2000:]
        lines.append(m.group(1))
    assert lines[0] == lines[1]
    # scores equal the exact top-k (numpy) within bucketed quantization
    rng2 = np.random.default_rng(11)
    dense = (rng2.random((300, 200)) < 0.12).astype(np.float32)
    q = np.abs(rng2.normal(size=(3, 200))).astype(np.float32)
    exact = q @ dense.T
    m0 = re.search(r"scores=(\[.*\])", lines[0])
    got = np.array(eval(m0.group(1)))  # noqa: S307 - test-local literal
    for i in range(3):
        np.testing.assert_allclose(np.sort(got[i])[::-1],
                                   np.sort(exact[i])[::-1][:6],
                                   rtol=5e-3, atol=0.05)


@pytest.mark.slow
def test_two_process_real_trainer():
    """The actual RetrieverTrainer (not a hand-rolled step) runs
    multi-process: per-process data shards, global batches assembled
    via make_array_from_process_local_data, identical final step count
    and parameter checksum on both processes."""
    port = str(_free_port())
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in (0, 1)]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        m = re.search(r"TRAINER pid=\d step=(\d+) "
                      r"checksum=([0-9.]+)", out)
        assert m, out[-3000:]
        results.append((int(m.group(1)), float(m.group(2))))
    # 2 iterations/epoch x 2 epochs
    assert results[0][0] == results[1][0] == 4
    assert results[0][1] == pytest.approx(results[1][1], rel=1e-6)
