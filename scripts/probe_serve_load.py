"""Socket-level serve load probe (VERDICT r4 item 6).

Measures the FULL serving stack — HTTP parse, json, coalescer, device
search, result serialization — under concurrent closed-loop load, where
previous rounds only attested the device kernels underneath. Starts
scripts/probe_serve_server.py (bert-base VDR + 200k BoT index) as a
subprocess that owns the TPU, then drives phases of W concurrent
closed-loop client THREADS each sending batch-B /search requests for D
seconds.

Threads, not processes: this host has ONE shared CPU core, and a
process-per-client design starves both the clients and the server on
spawn (the first attempt's conc=32 phase never finished spawning).
The clients are I/O-bound — each thread spends its life blocked on the
socket waiting for the server's device call — so the GIL costs only the
microseconds of json encode per request. Aggregate QPS is computed over
the union active window [first thread start, last thread end], which a
thread records itself, so client startup cost never leaks into the rate.

Reports per phase: aggregate QPS (queries/s), request p50/p99 ms, error
count; plus the coalescer's device_calls/requests ratio from /stats and
a /healthz RTT baseline for the bare HTTP stack.

Run alone (the server child takes the TPU claim):
    env -u JAX_PLATFORMS python scripts/probe_serve_load.py
"""
import argparse
import json
import os
import random
import signal
import subprocess
import sys
import threading
import time
import urllib.request


def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        return json.loads(resp.read())


WORDS = ("green tea mars planet einstein relativity city river "
         "history music film president language science computer "
         "network model train retrieval document term weight score "
         "rank vector binary lexical university book island energy"
         ).split()


def worker(url: str, batch: int, rerank: bool, duration: float,
           wid: int, out: dict):
    """Closed-loop client thread: send batch-B requests until the
    deadline, record latencies and the actual active window."""
    rng = random.Random(1234 + wid)
    lats, errors = [], 0
    t_start = time.perf_counter()
    deadline = t_start + duration
    while time.perf_counter() < deadline:
        qs = [" ".join(rng.choices(WORDS, k=10)) for _ in range(batch)]
        t0 = time.perf_counter()
        try:
            _post(url + "/search",
                  {"queries": qs, "k": 100, "rerank": rerank,
                   "tenant": f"w{wid}"})
            lats.append((time.perf_counter() - t0) * 1e3)
        except Exception:
            errors += 1
    out[wid] = {"lats_ms": lats, "errors": errors,
                "t_start": t_start, "t_end": time.perf_counter()}


def run_phase(url: str, conc: int, batch: int, rerank: bool,
              duration: float):
    out = {}
    threads = [threading.Thread(
        target=worker, args=(url, batch, rerank, duration, w, out))
        for w in range(conc)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=duration + 300)
    lats, errors = [], 0
    for d in out.values():
        lats.extend(d["lats_ms"])
        errors += d["errors"]
    window = (max(d["t_end"] for d in out.values())
              - min(d["t_start"] for d in out.values()))
    lats.sort()
    n = len(lats)

    def pct(p):
        return round(lats[min(n - 1, int(p * n))], 1) if n else None

    return {"conc": conc, "batch": batch, "rerank": rerank,
            "requests": n, "errors": errors,
            "qps": round(n * batch / window, 1),
            "req_p50_ms": pct(0.50), "req_p99_ms": pct(0.99)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--port", type=int, default=8123)
    ap.add_argument("--num-passages", type=int, default=200_000)
    args = ap.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    server_cmd = [sys.executable,
                  os.path.join(here, "probe_serve_server.py"),
                  "--port", str(args.port),
                  "--num-passages", str(args.num_passages)]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the server child owns the TPU
    srv = subprocess.Popen(server_cmd, cwd=os.path.dirname(here),
                           stdout=subprocess.PIPE, text=True, env=env)
    url = f"http://127.0.0.1:{args.port}"
    try:
        # build + warmup can take minutes on a cold compile cache
        deadline = time.time() + 1800
        line = ""
        while time.time() < deadline:
            line = srv.stdout.readline()
            if line.startswith("READY"):
                break
            if srv.poll() is not None:
                raise RuntimeError("server died during startup")
        if not line.startswith("READY"):
            raise RuntimeError("server never became ready")

        # bare-HTTP-stack baseline
        _get(url + "/healthz")
        t0 = time.perf_counter()
        reps = 200
        for _ in range(reps):
            _get(url + "/healthz")
        health_rtt_ms = (time.perf_counter() - t0) / reps * 1e3

        phases = []
        for conc, batch, rerank in ((1, 1, False), (8, 1, False),
                                    (32, 1, False), (8, 8, False),
                                    (32, 8, False), (32, 32, False),
                                    (4, 4, True), (16, 4, True)):
            ph = run_phase(url, conc, batch, rerank, args.duration)
            print(json.dumps(ph), flush=True)
            phases.append(ph)
            # Drain the coalescer queue before the next phase: a
            # closed-loop phase ends with up to p99-deep backlog still
            # in flight, which otherwise bleeds into the next phase's
            # first-request latencies (observed: a 13.7 s rerank p50
            # inherited from the preceding conc=32 batch=32 queue).
            time.sleep(max(2.0, (ph["req_p99_ms"] or 0) / 1e3))
            _post(url + "/search", {"queries": ["drain sentinel"],
                                    "k": 10, "rerank": False})

        stats = _get(url + "/stats")
        out = {"num_passages": args.num_passages,
               "healthz_rtt_ms": round(health_rtt_ms, 2),
               "client": "threads, single shared host core",
               "phases": phases, "server_stats": stats}
        path = os.path.join(os.path.dirname(here), "docs",
                            "probe_serve_load.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}")
    finally:
        srv.send_signal(signal.SIGTERM)
        try:
            srv.wait(timeout=60)
        except subprocess.TimeoutExpired:
            srv.kill()


if __name__ == "__main__":
    main()
