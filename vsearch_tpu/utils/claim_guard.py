"""TPU-claim hygiene: a PID registry for processes that touch the chip.

The single-chip tunnel admits ONE claim, taken implicitly at first
device use and released only on *clean* process exit (the advisory
claim-DELETE does not run when a holder is SIGKILLed). A leftover serve
or probe process therefore wedges the chip for every later process —
``jax.devices()`` blocks silently with no error (this cost round 3 its
entire benchmark run).

Design: every entry point that will claim the device calls
``register_tpu_process()``, which drops ``/tmp/vsearch_tpu_pids/<pid>``
with the process start time, and installs a SIGTERM handler that exits
cleanly (so the claim release path runs). ``cleanup_stale()`` — called
by ``bench.py`` before probing the device — terminates ONLY processes
recorded in this registry, verified by start time against PID reuse,
never by matching command lines (a pattern kill can hit unrelated
processes, including the caller's own session).
"""
from __future__ import annotations

import atexit
import json
import os
import signal
import sys
import time
from pathlib import Path
from typing import List

PID_DIR = Path(os.environ.get("VSEARCH_TPU_PID_DIR",
                              "/tmp/vsearch_tpu_pids"))


def _proc_start_time(pid: int) -> int | None:
    """Kernel start time (clock ticks since boot) — stable identity for
    a PID; a recycled PID gets a different value."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            stat = f.read().decode("ascii", "replace")
        # field 22, counting from 1; the comm field (2) may contain
        # spaces/parens, so split after the LAST ')'
        fields = stat.rsplit(")", 1)[1].split()
        return int(fields[19])
    except (OSError, IndexError, ValueError):
        return None


def register_tpu_process(kind: str) -> None:
    """Record this process in the claim registry and make SIGTERM a
    clean exit (KeyboardInterrupt-like), so a later ``cleanup_stale``
    can both find us and terminate us without wedging the claim."""
    pid = os.getpid()
    PID_DIR.mkdir(parents=True, exist_ok=True)
    path = PID_DIR / str(pid)
    path.write_text(json.dumps({
        "kind": kind,
        "start_time": _proc_start_time(pid),
        "argv": sys.argv[:4],
    }))

    def _unlink():
        try:
            path.unlink()
        except OSError:
            pass

    atexit.register(_unlink)
    # only from the main thread, and only if nothing custom is installed
    try:
        if signal.getsignal(signal.SIGTERM) == signal.SIG_DFL:
            signal.signal(signal.SIGTERM,
                          lambda *_: sys.exit(143))
    except ValueError:  # not the main thread
        pass


def _ancestors() -> set:
    """PIDs of this process and its ancestors (never kill those)."""
    out = set()
    pid = os.getpid()
    while pid > 1:
        out.add(pid)
        try:
            with open(f"/proc/{pid}/stat", "rb") as f:
                stat = f.read().decode("ascii", "replace")
            pid = int(stat.rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            break
    return out


def list_registered(exclude_kinds: tuple = ()) -> List[tuple]:
    """Live registered TPU processes as (pid, kind, registry_file),
    excluding this process/ancestors, dead PIDs (their records are
    dropped), recycled PIDs, and any ``exclude_kinds``. Registry-file
    records of skipped-by-kind processes are left in place."""
    if not PID_DIR.is_dir():
        return []
    skip = _ancestors()
    entries = []
    for f in PID_DIR.iterdir():
        try:
            pid = int(f.name)
        except ValueError:
            continue
        if pid in skip:
            continue
        st = _proc_start_time(pid)
        if st is None:  # already gone — drop the stale record
            try:
                f.unlink()
            except OSError:
                pass
            continue
        try:
            rec = json.loads(f.read_text())
        except (OSError, ValueError):
            rec = {}
        if rec.get("start_time") not in (None, st):
            # PID was recycled by an unrelated process: forget it
            try:
                f.unlink()
            except OSError:
                pass
            continue
        if rec.get("kind") in exclude_kinds:
            continue
        entries.append((pid, rec.get("kind", "?"), f))
    return entries


def cleanup_stale(wait_s: float = 10.0,
                  exclude_kinds: tuple = ()) -> List[int]:
    """Terminate stale registered TPU processes (SIGTERM, escalate to
    SIGKILL after ``wait_s``). Returns the list of PIDs signalled.
    Only touches PIDs this registry recorded, and only when the live
    process's kernel start time matches the recorded one. Kinds in
    ``exclude_kinds`` (e.g. a deliberately-running 'serve') are left
    alone — registry membership alone does not prove staleness."""
    killed: List[int] = []
    entries = [(pid, f)
               for pid, _kind, f in list_registered(exclude_kinds)]
    for pid, _f in entries:
        try:
            os.kill(pid, signal.SIGTERM)
            killed.append(pid)
        except OSError:
            pass
    deadline = time.monotonic() + wait_s
    pending = dict(entries)
    while pending and time.monotonic() < deadline:
        for pid in list(pending):
            if _proc_start_time(pid) is None:
                try:
                    pending.pop(pid).unlink()
                except OSError:
                    pass
        time.sleep(0.2)
    for pid, f in pending.items():  # clean exit didn't happen
        try:
            os.kill(pid, signal.SIGKILL)
        except OSError:
            pass
        try:
            f.unlink()
        except OSError:
            pass
    return killed
