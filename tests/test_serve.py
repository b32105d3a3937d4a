"""HTTP serving layer tests: live server thread + urllib round trips."""
import json
import threading
import urllib.request

import numpy as np
import pytest

from tests.helpers import make_tokenizer, tiny_bert_config
from vsearch_tpu.retriever import Retriever, RetrieverConfig
from vsearch_tpu.serve import serve

CORPUS = ["green tea is a drink", "the red planet mars",
          "einstein theory of relativity", "a dog runs in the city"]


@pytest.fixture(scope="module")
def server():
    tok = make_tokenizer()
    enc = {
        "type": "vdr", "max_len": 32, "topk": 16, "shift_vocab_num": 5,
        **{k: v for k, v in vars(tiny_bert_config(tok.vocab_size)).items()
           if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size",
                    "max_position_embeddings")},
    }
    cfg = RetrieverConfig(encoder_q=dict(enc), encoder_p=dict(enc),
                          shared_encoder=True)
    r = Retriever(cfg, tokenizer=tok)
    r.build_index(CORPUS, batch_size=4, index_type="bag_of_token")
    srv = serve(r, host="127.0.0.1", port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.loads(resp.read())


def test_healthz(server):
    assert _get(server + "/healthz") == {"status": "ok"}


def test_search_endpoint(server):
    out = _post(server + "/search",
                {"queries": ["green tea"], "k": 2,
                 "return_texts": True})
    assert len(out["ids"][0]) == 2
    assert len(out["scores"][0]) == 2
    assert len(out["texts"][0]) == 2
    assert all(isinstance(t, str) for t in out["texts"][0])


def test_search_with_rerank(server):
    out = _post(server + "/search",
                {"queries": ["einstein relativity"], "k": 3,
                 "rerank": True})
    assert len(out["ids"][0]) == 3
    s = out["scores"][0]
    assert s == sorted(s, reverse=True)


def test_embed_endpoint_sparse(server):
    out = _post(server + "/embed", {"texts": ["green tea"],
                                    "sparse": True})
    assert out["sparse"] is True
    assert len(out["dims"][0]) == len(out["values"][0]) > 0


def test_embed_endpoint_dense(server):
    out = _post(server + "/embed", {"texts": ["green tea"],
                                    "sparse": False})
    assert out["sparse"] is False
    assert len(out["embeddings"][0]) > 100


def test_stats_and_errors(server):
    stats = _get(server + "/stats")
    assert stats["search"]["steps"] >= 2
    # malformed request -> 400
    req = urllib.request.Request(
        server + "/search", data=b'{"nope": 1}',
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_coalescer_merges_concurrent_requests():
    """While a device call is in flight, queued requests must merge
    into ONE next call (round-2 weakness: the per-request lock
    serialized everything, ~100x throughput on the floor)."""
    import time

    from vsearch_tpu.serve import SearchCoalescer

    calls = []

    def slow_search(queries, k, rerank, n_real=None):
        calls.append(len(queries))
        time.sleep(0.05)  # device busy: followers pile up
        ids = np.asarray([[hash(q) % 97] * k for q in queries])
        return ids, ids.astype(np.float32)

    co = SearchCoalescer(slow_search)
    results = {}

    def client(i):
        ids, scores = co.submit([f"q{i}a", f"q{i}b"], k=3, rerank=False)
        results[i] = np.asarray(ids)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 8
    for i, ids in results.items():
        assert ids.shape == (2, 3)
        # each row carries its own query's payload (no cross-request mixup)
        assert ids[0, 0] == hash(f"q{i}a") % 97
        assert ids[1, 0] == hash(f"q{i}b") % 97
    # 8 requests -> far fewer device calls (first leader + merged rest)
    assert len(calls) < 8
    # batches pad up to power-of-two buckets (anti-retrace), so the
    # backend may see more rows than real queries, never fewer
    assert sum(calls) >= 16
    assert all(c == co._bucket(c) for c in calls)


def test_coalescer_isolates_poisoned_requests():
    """One bad payload in a merged batch must not fail its co-riders:
    the group retries each request alone and only the bad one errors."""
    import time

    from vsearch_tpu.serve import SearchCoalescer

    def search(queries, k, rerank, n_real=None):
        if any(q == "BAD" for q in queries):
            raise RuntimeError("poison")
        time.sleep(0.05)
        ids = np.asarray([[1] * k for _ in queries])
        return ids, ids.astype(np.float32)

    co = SearchCoalescer(search)
    results = {}

    def client(i, text):
        try:
            results[i] = co.submit([text], k=2, rerank=False)
        except Exception as exc:
            results[i] = exc

    threads = [threading.Thread(target=client, args=(i, t)) for i, t in
               enumerate(["ok1", "BAD", "ok2", "ok3", "BAD", "ok4"])]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, t in enumerate(["ok1", "BAD", "ok2", "ok3", "BAD", "ok4"]):
        if t == "BAD":
            assert isinstance(results[i], RuntimeError)
        else:
            ids, _ = results[i]
            assert np.asarray(ids).shape == (1, 2)


def test_coalescer_splits_giant_requests():
    """A request larger than max_queries runs as several device calls
    (each within one call's budget) and still returns every row in
    order."""
    from vsearch_tpu.serve import SearchCoalescer

    calls = []

    def search(queries, k, rerank, n_real=None):
        calls.append(len(queries))
        ids = np.asarray([[hash(q) % 97] * k for q in queries])
        return ids, ids.astype(np.float32)

    co = SearchCoalescer(search, max_queries=4)
    queries = [f"q{i}" for i in range(10)]
    ids, scores = co.submit(queries, k=2, rerank=False)
    assert np.asarray(ids).shape == (10, 2)
    for i, q in enumerate(queries):
        assert ids[i][0] == hash(q) % 97
    assert len(calls) >= 3  # 10 queries / budget 4
    assert all(c <= co._bucket(4) for c in calls)


def test_coalescer_small_requests_jump_giant_chunks():
    """A singleton arriving while a giant request's first chunk is on
    the device must be served before the giant's remaining chunks
    (round-3 weakness: FIFO coalescing added the giant's whole latency
    to everything queued behind it)."""
    import time

    from vsearch_tpu.serve import SearchCoalescer

    call_log = []
    first_chunk_running = threading.Event()

    def search(queries, k, rerank, n_real=None):
        call_log.append(list(queries))
        first_chunk_running.set()
        time.sleep(0.08)  # device busy: the rest piles up
        ids = np.asarray([[1] * k for _ in queries])
        return ids, ids.astype(np.float32)

    co = SearchCoalescer(search, max_queries=2)
    order = []

    def giant():
        co.submit([f"g{i}" for i in range(6)], k=2, rerank=False)
        order.append("giant")

    def single():
        first_chunk_running.wait(timeout=5)
        co.submit(["single"], k=2, rerank=False)
        order.append("single")

    tg = threading.Thread(target=giant)
    ts = threading.Thread(target=single)
    tg.start()
    ts.start()
    tg.join()
    ts.join()
    single_call = next(i for i, c in enumerate(call_log)
                       if "single" in c)
    last_giant_call = max(i for i, c in enumerate(call_log)
                          if any(q.startswith("g") for q in c))
    assert single_call < last_giant_call
    assert order[0] == "single"


def test_coalescer_starvation_bound():
    """A continuous stream of singletons must not starve a big request:
    after MAX_PASS_OVER pass-overs its group runs regardless."""
    import time

    from vsearch_tpu.serve import SearchCoalescer

    call_log = []
    stop = threading.Event()

    def search(queries, k, rerank, n_real=None):
        call_log.append(len(queries))
        time.sleep(0.03)
        ids = np.asarray([[1] * k for _ in queries])
        return ids, ids.astype(np.float32)

    co = SearchCoalescer(search, max_queries=8)

    def spammer():
        while not stop.is_set():
            co.submit(["small"], k=2, rerank=False)

    spam_threads = [threading.Thread(target=spammer) for _ in range(3)]
    for t in spam_threads:
        t.start()
    time.sleep(0.1)  # spammers saturate the dispatcher
    t0 = time.time()
    ids, _ = co.submit([f"big{i}" for i in range(8)], k=2, rerank=False)
    big_wait = time.time() - t0
    stop.set()
    for t in spam_threads:
        t.join()
    assert np.asarray(ids).shape == (8, 2)
    # pass-over bound: the big call runs within MAX_PASS_OVER + its own
    # call (~4 x 0.03 s); a starved request would wait the full 5 s
    assert big_wait < 1.0


def test_search_empty_queries_rejected(server):
    req = urllib.request.Request(
        server + "/search", data=b'{"queries": []}',
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_coalescer_propagates_errors():
    from vsearch_tpu.serve import SearchCoalescer

    def broken(queries, k, rerank, n_real=None):
        raise RuntimeError("device on fire")

    co = SearchCoalescer(broken)
    with pytest.raises(RuntimeError, match="device on fire"):
        co.submit(["q"], k=1, rerank=False)


def test_concurrent_http_search_matches_serial(server):
    """Concurrent /search responses must be identical to one-at-a-time
    responses (coalescing is invisible to clients)."""
    queries = ["green tea", "red planet", "einstein relativity",
               "dog city"]
    serial = [_post(server + "/search", {"queries": [q], "k": 2})
              for q in queries]
    results = {}

    def client(i):
        results[i] = _post(server + "/search",
                           {"queries": [queries[i]], "k": 2})

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(queries))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(len(queries)):
        assert results[i]["ids"] == serial[i]["ids"]
    stats = _get(server + "/stats")
    assert stats["coalesced_device_calls"] >= 1


@pytest.fixture(scope="module")
def mesh_server():
    """Serve with the index + rerank sharded over the 8-device mesh
    (the --mesh_dp path of cli.serve)."""
    from vsearch_tpu.parallel.mesh import make_mesh

    tok = make_tokenizer()
    enc = {
        "type": "vdr", "max_len": 32, "topk": 16, "shift_vocab_num": 5,
        **{k: v for k, v in vars(tiny_bert_config(tok.vocab_size)).items()
           if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size",
                    "max_position_embeddings")},
    }
    cfg = RetrieverConfig(encoder_q=dict(enc), encoder_p=dict(enc),
                          shared_encoder=True)
    r = Retriever(cfg, tokenizer=tok)
    r.build_index(CORPUS * 3, batch_size=4, index_type="bag_of_token")
    r.to_mesh(make_mesh(dp=8, tp=1))
    srv = serve(r, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", r
    srv.shutdown()


def test_mesh_search_endpoint(mesh_server):
    url, r = mesh_server
    out = _post(url + "/search", {"queries": ["green tea drink"],
                                  "k": 3})
    assert len(out["ids"][0]) == 3
    assert all(0 <= i < len(CORPUS) * 3 for i in out["ids"][0])
    out2 = _post(url + "/search", {"queries": ["green tea drink"],
                                   "k": 3, "rerank": True})
    assert len(out2["ids"][0]) == 3


def test_no_coalesce_path_validates_requests():
    """Validation lives in RetrieverService.search, so the
    --no_coalesce lock path rejects bad payloads with the intended
    message instead of dying deep inside encode() (review finding,
    round 3)."""
    from vsearch_tpu.serve import RetrieverService

    class FakeRetriever:
        index = None

        def retrieve(self, queries, k, rerank=False):
            import numpy as _np

            self.last = list(queries)
            n = len(queries)
            return type("R", (), {"ids": _np.zeros((n, k), int),
                                  "scores": _np.zeros((n, k))})()

    r = FakeRetriever()
    svc = RetrieverService(r, coalesce=False)
    with pytest.raises(ValueError, match="non-empty list"):
        svc.search([])
    # a bare string is wrapped, not exploded into characters
    out = svc.search("green tea", k=2)
    assert r.last == ["green tea"]
    assert len(out["ids"]) == 1


def test_embed_endpoint_validates_requests():
    """/embed rejects empty payloads with a clear message and wraps a
    bare string, on both coalesced and lock paths (embed always takes
    the lock path) — previously np.concatenate noise (probe finding,
    round 3)."""
    from vsearch_tpu.serve import RetrieverService

    class FakeEncoder:
        def embed(self, texts, **kw):
            import numpy as _np

            return _np.zeros((len(texts), 4))

    class FakeRetriever:
        index = None
        encoder_q = FakeEncoder()

    svc = RetrieverService(FakeRetriever(), coalesce=False)
    with pytest.raises(ValueError, match="non-empty list"):
        svc.embed([])
    out = svc.embed("green tea", sparse=False)
    assert len(out["embeddings"]) == 1


def test_search_rejects_zero_k():
    """An explicit k=0 must not silently become default_k (review
    finding, round 3)."""
    from vsearch_tpu.serve import RetrieverService

    class FakeRetriever:
        index = None

        def retrieve(self, queries, k, rerank=False):
            import numpy as _np

            return type("R", (), {"ids": _np.zeros((len(queries), k),
                                                   int),
                                  "scores": _np.zeros((len(queries),
                                                       k))})()

    svc = RetrieverService(FakeRetriever(), coalesce=False)
    with pytest.raises(ValueError, match="k must be"):
        svc.search(["q"], k=0)


def test_coalescer_groups_by_query_kind():
    """String and embedding-vector queries must not merge into one
    device call (the backend branches on element type) — both kinds
    must still succeed concurrently (review finding, round 3)."""
    import numpy as np

    from vsearch_tpu.serve import SearchCoalescer

    calls = []

    def backend(queries, k, rerank, n_real=None):
        kinds = {type(q).__name__ for q in queries}
        assert len(kinds) == 1, f"mixed kinds in one call: {kinds}"
        calls.append(sorted(kinds))
        n = len(queries)
        return np.zeros((n, k), int), np.zeros((n, k))

    co = SearchCoalescer(backend)
    out = []
    ts = []
    for payload in (["text one"], [[0.1, 0.2]], ["text two"]):
        t = threading.Thread(
            target=lambda p=payload: out.append(
                co.submit(p, k=2, rerank=False)))
        t.start()
        ts.append(t)
    for t in ts:
        t.join(30)
    assert len(out) == 3
    assert all(len(k) == 1 for k in calls)


def test_coalescer_fuzz_matches_serial():
    """Randomized concurrent load: any mix of sizes, k values and
    query kinds must return exactly what serial execution would — the
    scheduler (size-fair + starvation bound + kind grouping) only
    reorders device calls, never results."""
    import random

    import numpy as np

    from vsearch_tpu.serve import SearchCoalescer

    def backend(queries, k, rerank, n_real=None):
        # deterministic per-query result: hash of the payload
        def val(q):
            if isinstance(q, str):
                return float(len(q)) + (1000.0 if rerank else 0.0)
            return float(np.sum(q)) + (1000.0 if rerank else 0.0)

        n = len(queries)
        ids = np.arange(n * k).reshape(n, k)
        scores = np.asarray([[val(q) + j for j in range(k)]
                             for q in queries])
        return ids, scores

    co = SearchCoalescer(backend, max_queries=8)
    rng = random.Random(7)
    payloads = []
    for i in range(40):
        k = rng.choice([1, 3, 5])
        rerank = rng.random() < 0.3
        if rng.random() < 0.5:
            qs = [f"query {i} {j} {'x' * rng.randrange(5)}"
                  for j in range(rng.randrange(1, 13))]
        else:
            qs = [[float(i), float(j)]
                  for j in range(rng.randrange(1, 13))]
        payloads.append((qs, k, rerank))

    results = [None] * len(payloads)

    def run(idx):
        qs, k, rerank = payloads[idx]
        results[idx] = co.submit(qs, k=k, rerank=rerank)

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(len(payloads))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)

    for (qs, k, rerank), got in zip(payloads, results):
        assert got is not None, "request lost"
        _ids, scores = got
        expect = np.asarray([[ (float(len(q)) if isinstance(q, str)
                                else float(np.sum(q)))
                               + (1000.0 if rerank else 0.0) + j
                               for j in range(k)] for q in qs])
        np.testing.assert_allclose(np.asarray(scores), expect)


def _item(queries, k, tenant, rerank=False):
    """Build a coalescer queue item (dispatcher tuple layout)."""
    kind = "str" if isinstance(queries[0], str) else "vec"
    return (list(queries), (k, kind), rerank, threading.Event(), {},
            tenant)


def test_coalescer_tenant_lead_rotation():
    """The lead tenant rotates round-robin: a tenant with many small
    pending requests cannot win every wakeup against another tenant's
    single larger request (pre-tenant policy picked the globally
    smallest group every time until the pass-over bound)."""
    from vsearch_tpu.serve import SearchCoalescer

    co = SearchCoalescer(lambda *a, **kw: (_ for _ in ()).throw(
        AssertionError("dispatcher must stay idle")), max_queries=8)

    a1 = [_item(["a1"], 2, "A"), _item(["a2"], 2, "A"),
          _item(["a3"], 2, "A")]
    b = _item(["b0", "b1", "b2", "b3"], 3, "B")  # bigger AND rarer
    sel1 = co._select(a1 + [b])
    assert all(it[5] == "A" for it in sel1)  # first-seen tenant leads

    # next wakeup: fresh A singletons have arrived; rotation hands the
    # lead to B even though A's group is still the smaller one
    a2 = [_item(["a4"], 2, "A"), _item(["a5"], 2, "A")]
    sel2 = co._select([b] + a2)
    assert sel2 == [b]
    assert co.tenant_leads == {"A": 1, "B": 1}

    # and back to A
    sel3 = co._select(a2)
    assert all(it[5] == "A" for it in sel3)
    assert co.tenant_leads["A"] == 2


def test_coalescer_cross_tenant_coriding():
    """Same-(k, kind, rerank) requests from different tenants merge
    into ONE device call: tenant fairness must not cost coalescing
    throughput when the groups are compatible anyway."""
    from vsearch_tpu.serve import SearchCoalescer

    co = SearchCoalescer(lambda *a, **kw: None, max_queries=8)
    items = [_item(["a"], 2, "A"), _item(["b"], 2, "B"),
             _item(["c"], 2, "C")]
    sel = co._select(list(items))
    assert {it[5] for it in sel} == {"A", "B", "C"}

    # budget still binds: co-riders stop at max_queries
    co2 = SearchCoalescer(lambda *a, **kw: None, max_queries=2)
    sel2 = co2._select(list(items))
    assert len(sel2) == 2 and sel2[0][5] == "A"


def test_coalescer_tenant_flood_fairness():
    """Threaded end-to-end: tenant A floods singletons; tenant B's
    incompatible (different-k) request is served within ~one rotation,
    not after the pass-over bound."""
    import time

    from vsearch_tpu.serve import SearchCoalescer

    stop = threading.Event()

    def search(queries, k, rerank, n_real=None):
        time.sleep(0.03)
        ids = np.asarray([[1] * k for _ in queries])
        return ids, ids.astype(np.float32)

    co = SearchCoalescer(search, max_queries=8)

    def spammer():
        while not stop.is_set():
            co.submit(["small"], k=2, rerank=False, tenant="A")

    threads = [threading.Thread(target=spammer) for _ in range(3)]
    for t in threads:
        t.start()
    time.sleep(0.1)
    t0 = time.time()
    ids, _ = co.submit(["b0", "b1"], k=3, rerank=False, tenant="B")
    b_wait = time.time() - t0
    stop.set()
    for t in threads:
        t.join()
    assert np.asarray(ids).shape == (2, 3)
    # rotation serves B on the wakeup after its arrival: its wait is
    # bounded by ~2 device calls, far under the pass-over fallback
    assert b_wait < 0.5
    assert co.tenant_leads["B"] >= 1


def test_search_tenant_http(server):
    """The tenant field flows HTTP -> coalescer; /stats exposes the
    per-tenant lead breakdown once real tenants appear; a non-string
    tenant is a 400, not a server error."""
    out = _post(server + "/search",
                {"queries": ["green tea"], "k": 2, "tenant": "acme"})
    assert len(out["ids"][0]) == 2
    _post(server + "/search",
          {"queries": ["mars"], "k": 2, "tenant": "globex"})
    stats = _get(server + "/stats")
    leads = stats["tenant_device_leads"]
    assert leads.get("acme", 0) >= 1 and leads.get("globex", 0) >= 1

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server + "/search",
              {"queries": ["tea"], "tenant": 7})
    assert ei.value.code == 400


def test_coalescer_tenant_cardinality_bounded():
    """Untrusted tenant strings must not grow dispatcher state without
    bound (ADVICE r4): the rotation caps at MAX_TENANTS with idle
    tenants evicted, lead counters stay bounded (evicted counts fold
    into one aggregate), and when every slot has pending work a new
    tenant folds into the "-" bucket instead of growing the list."""
    from vsearch_tpu.serve import SearchCoalescer

    co = SearchCoalescer(lambda *a, **kw: None, max_queries=8)
    cap = SearchCoalescer.MAX_TENANTS
    for i in range(cap * 3):  # one unique tenant per wakeup
        co._select([_item([f"q{i}"], 2, f"tenant-{i}")])
    assert len(co._tenant_order) <= cap
    assert len(co.tenant_leads) <= cap
    assert "-" in co._tenant_order  # fold bucket is permanent
    assert (sum(co.tenant_leads.values()) + co.evicted_tenant_leads
            == cap * 3)

    # every rotation slot busy in ONE wakeup: overflow tenants fold
    # into "-" and still co-ride the same device call
    co2 = SearchCoalescer(lambda *a, **kw: None, max_queries=512)
    pending = [_item([f"p{i}"], 2, f"t{i}") for i in range(cap + 5)]
    sel = co2._select(list(pending))
    assert len(co2._tenant_order) == cap
    assert len(sel) == len(pending)  # same group: all co-ride
