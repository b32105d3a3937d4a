"""TPU-claim registry: register / stale-cleanup semantics.

The guard must terminate only PIDs its own registry recorded (verified
by kernel start time), never the calling session, and must turn
SIGTERM into a clean exit so the device claim's atexit release runs.
"""
import json
import os
import subprocess
import sys
import time

from vsearch_tpu.utils import claim_guard


def test_cleanup_kills_only_registered(tmp_path, monkeypatch):
    monkeypatch.setattr(claim_guard, "PID_DIR", tmp_path)

    # a child that registers itself and then sleeps "forever"
    child = subprocess.Popen(
        [sys.executable, "-c",
         "import os, sys, time;"
         f"os.environ['VSEARCH_TPU_PID_DIR']={str(tmp_path)!r};"
         "sys.path.insert(0, os.getcwd());"
         "from vsearch_tpu.utils import claim_guard;"
         "claim_guard.register_tpu_process('test');"
         "print('ready', flush=True);"
         "time.sleep(300)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE, text=True)
    try:
        assert child.stdout.readline().strip() == "ready"
        # the registry saw the child...
        rec = json.loads((tmp_path / str(child.pid)).read_text())
        assert rec["kind"] == "test"

        # ...and an unrelated live PID (ourselves) must never be touched
        killed = claim_guard.cleanup_stale(wait_s=10.0)
        assert killed == [child.pid]
        child.wait(timeout=10)
        # SIGTERM handler exits cleanly (atexit ran -> claim released);
        # exit code is the handler's 143, not a signal death (-15)
        assert child.returncode == 143
        assert not (tmp_path / str(child.pid)).exists()
    finally:
        if child.poll() is None:
            child.kill()


def test_cleanup_ignores_recycled_and_dead_pids(tmp_path, monkeypatch):
    monkeypatch.setattr(claim_guard, "PID_DIR", tmp_path)
    # dead PID: record for a process that no longer exists
    (tmp_path / "999999").write_text(json.dumps(
        {"kind": "test", "start_time": 1}))
    # recycled PID: a live process (init) whose start time mismatches
    (tmp_path / "1").write_text(json.dumps(
        {"kind": "test", "start_time": -12345}))
    assert claim_guard.cleanup_stale(wait_s=0.5) == []
    assert not (tmp_path / "999999").exists()
    assert not (tmp_path / "1").exists()


def test_register_is_idempotent_and_unlinks_on_exit(tmp_path):
    code = (
        "import os, sys;"
        f"os.environ['VSEARCH_TPU_PID_DIR']={str(tmp_path)!r};"
        "sys.path.insert(0, os.getcwd());"
        "from vsearch_tpu.utils import claim_guard;"
        "claim_guard.register_tpu_process('a');"
        "claim_guard.register_tpu_process('b');"
        "print(os.getpid())")
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, check=True)
    pid = out.stdout.strip()
    # clean exit removed the record
    deadline = time.monotonic() + 5
    while (tmp_path / pid).exists() and time.monotonic() < deadline:
        time.sleep(0.05)
    assert not (tmp_path / pid).exists()


def test_cleanup_excludes_kinds(tmp_path, monkeypatch):
    """A deliberately-running 'serve' must survive cleanup unless the
    caller explicitly opts in (ADVICE r4: registry membership alone is
    not staleness); its registry record stays for a later opt-in pass."""
    monkeypatch.setattr(claim_guard, "PID_DIR", tmp_path)
    child = subprocess.Popen(
        [sys.executable, "-c",
         "import os, sys, time;"
         f"os.environ['VSEARCH_TPU_PID_DIR']={str(tmp_path)!r};"
         "sys.path.insert(0, os.getcwd());"
         "from vsearch_tpu.utils import claim_guard;"
         "claim_guard.register_tpu_process('serve');"
         "print('ready', flush=True);"
         "time.sleep(300)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE, text=True)
    try:
        assert child.stdout.readline().strip() == "ready"
        assert [(p, k) for p, k, _ in
                claim_guard.list_registered(("serve",))] == []
        assert claim_guard.cleanup_stale(wait_s=0.5,
                                         exclude_kinds=("serve",)) == []
        assert child.poll() is None  # still alive
        assert (tmp_path / str(child.pid)).exists()
        # opt-in pass sees and terminates it
        assert [(p, k) for p, k, _ in claim_guard.list_registered()] \
            == [(child.pid, "serve")]
        assert claim_guard.cleanup_stale(wait_s=10.0) == [child.pid]
        child.wait(timeout=10)
    finally:
        if child.poll() is None:
            child.kill()
