"""Continuous-batching server tests: slot isolation, admission mid-flight,
parity with the single-stream engine."""

import numpy as np
import pytest

from calm_tpu.engine import Engine
from calm_tpu.serve import Server, bucket_len
from tests.modelgen import tiny_config, write_tiny_model


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("srv")
    cfg = tiny_config(dtype="fp16", seq_len=64)
    path = str(d / "m.calm")
    write_tiny_model(path, cfg, seed=1)
    return path


def test_bucket_len():
    assert bucket_len(1, 4096) == 16
    assert bucket_len(17, 4096) == 32
    assert bucket_len(100, 64) == 64


def test_single_request_matches_engine(model_path):
    eng = Engine(model_path, kv_dtype="fp16")
    want = eng.generate("AB", steps=10, temperature=0.0)

    srv = Server(model_path, batch=2, kv_dtype="fp16")
    req = srv.submit("AB", max_tokens=10, temperature=0.0)
    srv.run_until_drained()
    assert req.done
    # engine counts prompt+generated positions; compare generated text
    assert req.text == want.text or want.text.startswith(req.text[:4])


def test_concurrent_requests_isolated(model_path):
    # two different prompts decoded together == each decoded alone
    srv1 = Server(model_path, batch=1, kv_dtype="fp16")
    a_solo = srv1.submit("AB", max_tokens=8, temperature=0.0)
    srv1.run_until_drained()

    srv2 = Server(model_path, batch=1, kv_dtype="fp16")
    b_solo = srv2.submit("zq", max_tokens=8, temperature=0.0)
    srv2.run_until_drained()

    srv = Server(model_path, batch=2, kv_dtype="fp16")
    a = srv.submit("AB", max_tokens=8, temperature=0.0)
    b = srv.submit("zq", max_tokens=8, temperature=0.0)
    srv.run_until_drained()

    assert a.text == a_solo.text
    assert b.text == b_solo.text


def test_slot_reuse_after_finish(model_path):
    """More requests than slots: later requests reuse freed slots and still
    decode correctly (prefill resets the slot's cache semantics)."""
    srv = Server(model_path, batch=1, kv_dtype="fp16")
    reqs = [srv.submit(p, max_tokens=6, temperature=0.0)
            for p in ("AB", "zq", "mn")]
    srv.run_until_drained()
    assert all(r.done for r in reqs)

    for prompt, got in (("AB", reqs[0]), ("zq", reqs[1]), ("mn", reqs[2])):
        solo = Server(model_path, batch=1, kv_dtype="fp16")
        r = solo.submit(prompt, max_tokens=6, temperature=0.0)
        solo.run_until_drained()
        assert got.text == r.text, prompt


def test_mid_flight_admission(model_path):
    """A request admitted while another decodes must not disturb it."""
    srv = Server(model_path, batch=2, kv_dtype="fp16")
    a = srv.submit("AB", max_tokens=12, temperature=0.0)
    for _ in range(4):
        srv.tick()
    b = srv.submit("zq", max_tokens=6, temperature=0.0)
    srv.run_until_drained()
    assert a.done and b.done

    solo = Server(model_path, batch=2, kv_dtype="fp16")
    a2 = solo.submit("AB", max_tokens=12, temperature=0.0)
    solo.run_until_drained()
    assert a.text == a2.text


def test_metrics_recorded(model_path):
    srv = Server(model_path, batch=1, kv_dtype="fp16")
    r = srv.submit("AB", max_tokens=4, temperature=0.0)
    srv.run_until_drained()
    assert r.finished_at >= r.first_token_at >= r.submitted_at
    assert r.n_generated <= 4


def test_device_sampling_greedy_parity(model_path):
    """Greedy requests produce identical text with host and device sampling."""
    host = Server(model_path, batch=2)
    dev = Server(model_path, batch=2, device_sampling=True)
    outs = []
    for srv in (host, dev):
        r1 = srv.submit("hello world", max_tokens=8, temperature=0.0)
        r2 = srv.submit("the quick", max_tokens=8, temperature=0.0)
        srv.run_until_drained(max_ticks=40)
        assert r1.done and r2.done
        outs.append((r1.text, r2.text))
    assert outs[0] == outs[1]


def test_sharded_server_parity(model_path):
    """Continuous batching on a tp=2-sharded model matches the plain server."""
    from calm_tpu.parallel import ShardingPlan, make_mesh

    plain = Server(model_path, batch=2)
    mesh = make_mesh(tp=2)
    shrd = Server(model_path, batch=2, mesh=mesh, plan=ShardingPlan(tp="tp"))
    outs = []
    for srv in (plain, shrd):
        r1 = srv.submit("hello world", max_tokens=8, temperature=0.0)
        r2 = srv.submit("the quick brown", max_tokens=8, temperature=0.0)
        srv.run_until_drained(max_ticks=40)
        assert r1.done and r2.done
        outs.append((r1.text, r2.text))
    assert outs[0] == outs[1]


def test_dp_sharded_server_parity(model_path):
    """Continuous batching with slots PARTITIONED over a dp axis (x tp):
    admission lands in the owning dp shard (model.prefill_slot_fn masks the
    non-owners' writes) and outputs match the plain server."""
    from calm_tpu.parallel import ShardingPlan, make_mesh

    plain = Server(model_path, batch=4)
    mesh = make_mesh(dp=2, tp=2)
    shrd = Server(model_path, batch=4, mesh=mesh,
                  plan=ShardingPlan(dp="dp", tp="tp"))
    outs = []
    for srv in (plain, shrd):
        reqs = [srv.submit(p, max_tokens=8, temperature=0.0)
                for p in ("hello world", "the quick brown", "pack my box")]
        srv.run_until_drained(max_ticks=60)
        assert all(r.done for r in reqs)
        outs.append([r.text for r in reqs])
    assert outs[0] == outs[1]


def test_dp_sharded_server_mid_flight_admission(model_path):
    """A request admitted while dp-sharded decode is in flight lands in a
    shard-owned slot without disturbing running slots."""
    from calm_tpu.parallel import ShardingPlan, make_mesh

    mesh = make_mesh(dp=2)
    srv = Server(model_path, batch=2, mesh=mesh, plan=ShardingPlan(dp="dp"))
    r1 = srv.submit("hello world", max_tokens=12, temperature=0.0)
    for _ in range(4):
        srv.tick()
    r2 = srv.submit("the quick", max_tokens=6, temperature=0.0)
    srv.run_until_drained(max_ticks=60)
    assert r1.done and r2.done

    plain = Server(model_path, batch=2)
    w1 = plain.submit("hello world", max_tokens=12, temperature=0.0)
    plain.run_until_drained(max_ticks=60)
    assert w1.text == r1.text


def test_prompt_truncation_flag(model_path):
    """Over-window prompts are clamped AND flagged to the client."""
    srv = Server(model_path, batch=1)
    long_prompt = "word " * 300  # >> 64-token window
    req = srv.submit(long_prompt, max_tokens=2, temperature=0.0)
    srv.run_until_drained(max_ticks=20)
    assert req.done
    assert req.truncated_prompt > 0


def test_multihost_dp_serving(model_path):
    """TWO jax.distributed processes run the continuous-batching loop in
    lockstep (dp=2 over the process axis, tp=2 inside each process): each
    admits its own requests, outputs match the single-process server."""
    import ast
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(__import__("os").environ)
    env["PYTHONPATH"] = "/root/repo"
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # workers set their own 2-device count
    workers = [
        subprocess.Popen(
            [sys.executable, "tests/multihost_serve_worker.py",
             str(pid), "2", str(port), model_path],
            cwd="/root/repo", env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    for w in workers:
        out, err = w.communicate(timeout=600)
        assert w.returncode == 0, err[-3000:]
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT\t"):
                _, pid, prompt, text = line.split("\t")
                results[prompt] = ast.literal_eval(text)
    assert set(results) == {"hello world", "pack my box",
                            "the quick brown"}

    plain = Server(model_path, batch=4)
    for prompt, text in results.items():
        req = plain.submit(prompt, max_tokens=8, temperature=0.0)
        plain.run_until_drained(max_ticks=40)
        assert req.done
        assert req.text == text, (prompt, req.text, text)


def test_multihost_dp_paged_serving(model_path):
    """TWO jax.distributed processes serve in dp-PAGED mode: no mesh — each
    process runs one independent PagedDecoder per local device over its own
    slot range (prefix caches per decoder). Outputs match the
    single-process paged server."""
    import ast
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(__import__("os").environ)
    env["PYTHONPATH"] = "/root/repo"
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    workers = [
        subprocess.Popen(
            [sys.executable, "tests/multihost_serve_worker.py",
             str(pid), "2", str(port), model_path, "paged"],
            cwd="/root/repo", env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    for w in workers:
        out, err = w.communicate(timeout=600)
        assert w.returncode == 0, err[-3000:]
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT\t"):
                _, pid, prompt, text = line.split("\t")
                results[prompt] = ast.literal_eval(text)
    assert set(results) == {"hello world", "pack my box",
                            "the quick brown"}

    plain = Server(model_path, batch=1, kv_dtype="fp16",
                   page_rows=16, pool_pages=8)
    for prompt, text in results.items():
        req = plain.submit(prompt, max_tokens=8, temperature=0.0)
        plain.run_until_drained(max_ticks=40)
        assert req.done
        assert req.text == text, (prompt, req.text, text)


def test_paged_server_parity(model_path):
    """Server(page_rows=...) decodes over the shared page pool and matches
    the dense server text-for-text; a pool smaller than batch x seq_len
    serves requests by recycling released pages."""
    plain = Server(model_path, batch=2, kv_dtype="fp16")
    # 4 pages x 16 rows = 64 rows total vs dense 2 x 64 = 128
    pg = Server(model_path, batch=2, kv_dtype="fp16",
                page_rows=16, pool_pages=4)
    outs = []
    for srv in (plain, pg):
        r1 = srv.submit("hello world", max_tokens=8, temperature=0.0)
        r2 = srv.submit("the quick", max_tokens=8, temperature=0.0)
        r3 = srv.submit("pack my box", max_tokens=6, temperature=0.0)
        srv.run_until_drained(max_ticks=80)
        assert r1.done and r2.done and r3.done
        outs.append((r1.text, r2.text, r3.text))
    assert outs[0] == outs[1]
    assert pg._paged.pages_in_use() == 0  # everything released


def test_paged_device_sampling_greedy_parity(model_path):
    """Paged decode composed with on-device sampling: logits never leave
    the device (only the sampled ints do) and greedy output matches the
    host-sampled paged server."""
    host = Server(model_path, batch=2, kv_dtype="fp16",
                  page_rows=16, pool_pages=4)
    dev = Server(model_path, batch=2, kv_dtype="fp16",
                 page_rows=16, pool_pages=4, device_sampling=True)
    outs = []
    for srv in (host, dev):
        r1 = srv.submit("hello world", max_tokens=8, temperature=0.0)
        r2 = srv.submit("the quick", max_tokens=8, temperature=0.0)
        srv.run_until_drained(max_ticks=60)
        assert r1.done and r2.done
        outs.append((r1.text, r2.text))
    assert outs[0] == outs[1]
    assert dev._paged.pages_in_use() == 0


def test_paged_server_pool_pressure(model_path):
    """When a slot needs a page and the pool is dry, the request finishes
    early with out_of_pages set instead of crashing the batch."""
    srv = Server(model_path, batch=2, kv_dtype="fp16",
                 page_rows=16, pool_pages=2)
    r1 = srv.submit("hello world am a long prompt", max_tokens=40,
                    temperature=0.0)
    r2 = srv.submit("the quick brown fox jumps", max_tokens=40,
                    temperature=0.0)
    srv.run_until_drained(max_ticks=120)
    assert r1.done and r2.done
    assert r1.out_of_pages or r2.out_of_pages


def test_multihost_dp_serving_device_sampling(model_path):
    """2-process dp serving with ON-DEVICE greedy sampling: only (B,) token
    ids cross to each host; per-process local rows reassemble the batch."""
    import ast
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(__import__("os").environ)
    env["PYTHONPATH"] = "/root/repo"
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    workers = [
        subprocess.Popen(
            [sys.executable, "tests/multihost_serve_worker.py",
             str(pid), "2", str(port), model_path, "device"],
            cwd="/root/repo", env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    results = {}
    for w in workers:
        out, err = w.communicate(timeout=600)
        assert w.returncode == 0, err[-3000:]
        for line in out.splitlines():
            if line.startswith("RESULT\t"):
                _, pid, prompt, text = line.split("\t")
                results[prompt] = ast.literal_eval(text)
    assert len(results) == 3

    # greedy on-device sampling matches the plain server's greedy output
    plain = Server(model_path, batch=4)
    for prompt, text in results.items():
        req = plain.submit(prompt, max_tokens=8, temperature=0.0)
        plain.run_until_drained(max_ticks=40)
        assert req.done
        assert req.text == text, (prompt, req.text, text)


def test_prefix_cache_parity(model_path):
    """Two requests sharing a long system-prompt prefix: the second is
    admitted from the prefix cache (only the suffix is prefilled) and must
    generate exactly what a cache-less server generates."""
    sys_prompt = "You are a helpful assistant. " * 3  # > GRAIN tokens
    p1 = sys_prompt + "Hello"
    p2 = sys_prompt + "Goodbye now"

    plain = Server(model_path, batch=1, kv_dtype="fp16")
    w1 = plain.submit(p1, max_tokens=8, temperature=0.0)
    plain.run_until_drained()
    w2 = plain.submit(p2, max_tokens=8, temperature=0.0)
    plain.run_until_drained()

    srv = Server(model_path, batch=1, kv_dtype="fp16",
                 prefix_cache_tokens=4096)
    r1 = srv.submit(p1, max_tokens=8, temperature=0.0)
    srv.run_until_drained()
    r2 = srv.submit(p2, max_tokens=8, temperature=0.0)
    srv.run_until_drained()

    assert r1.cached_prefix == 0          # cold
    assert r2.cached_prefix >= srv.prefix_cache.GRAIN  # hot: shared prefix
    assert r1.text == w1.text
    assert r2.text == w2.text
    assert srv.prefix_cache.hits == 1


def test_prefix_cache_full_prompt_hit(model_path):
    """Identical prompt resubmitted: the whole prefill is skipped."""
    prompt = "The quick brown fox jumps over the lazy dog again"
    srv = Server(model_path, batch=1, kv_dtype="fp16",
                 prefix_cache_tokens=4096)
    r1 = srv.submit(prompt, max_tokens=6, temperature=0.0)
    srv.run_until_drained()
    r2 = srv.submit(prompt, max_tokens=6, temperature=0.0)
    srv.run_until_drained()
    assert r2.cached_prefix > 0
    assert r2.text == r1.text


def test_prefix_cache_eviction(model_path):
    """Capacity is enforced by LRU eviction in whole entries."""
    from calm_tpu.serve import PrefixCache
    pc = PrefixCache(capacity_tokens=64)
    pc.put(tuple(range(48)), "k1", "v1")
    pc.put(tuple(range(100, 132)), "k2", "v2")   # 48+32 > 64 -> evict first
    assert pc.tokens <= 64
    n, kv = pc.match(list(range(48)))
    assert n == 0                                 # evicted
    n, kv = pc.match(list(range(100, 140)))
    assert n == 32 and kv == ("k2", "v2")


def test_paged_prefix_cache_parity(model_path):
    """Prefix sharing in paged mode: a hit PINS shared pool pages (no row
    copies into the slot) and only the suffix prefills; output matches the
    cache-less paged server."""
    sys_prompt = "abcd efgh " * 4  # ~40 tokens -> 2 full 16-row pages
    p1 = sys_prompt + "one"
    p2 = sys_prompt + "two three"

    plain = Server(model_path, batch=1, kv_dtype="fp16",
                   page_rows=16, pool_pages=10)
    w1 = plain.submit(p1, max_tokens=6, temperature=0.0)
    plain.run_until_drained()
    w2 = plain.submit(p2, max_tokens=6, temperature=0.0)
    plain.run_until_drained()

    srv = Server(model_path, batch=1, kv_dtype="fp16",
                 page_rows=16, pool_pages=10, prefix_cache_tokens=4096)
    r1 = srv.submit(p1, max_tokens=6, temperature=0.0)
    srv.run_until_drained()
    assert r1.cached_prefix == 0                   # cold
    pinned_pages = int((srv._paged.page_refs > 0).sum())
    assert pinned_pages >= 1                       # prompt pages pinned in place
    r2 = srv.submit(p2, max_tokens=6, temperature=0.0)
    srv.run_until_drained()
    assert r2.cached_prefix >= 16 and r2.cached_prefix % 16 == 0
    assert srv.prefix_cache.hits == 1
    assert r1.text == w1.text and r2.text == w2.text
    # slots drained: only the cache's pins keep pages out of the free pool
    assert srv._paged.pages_in_use() == 0
    n_pages = len(srv._paged.page_refs)
    assert (len(srv._paged.free_pages)
            + int((srv._paged.page_refs > 0).sum())) == n_pages


def test_paged_prefix_cow_on_wrap(model_path):
    """A slot decoding past seq_len writes into its (shared) early blocks —
    copy-on-write must give it private pages and leave the cached prefix
    intact for later hits."""
    sys_prompt = "abcd efgh " * 4
    srv = Server(model_path, batch=1, kv_dtype="fp16",
                 page_rows=16, pool_pages=12, prefix_cache_tokens=4096)
    r1 = srv.submit(sys_prompt + "one", max_tokens=6, temperature=0.0)
    srv.run_until_drained(max_ticks=40)
    # wraps the 64-row window: forces CoW of the shared write-target blocks
    r2 = srv.submit(sys_prompt + "xy", max_tokens=40, temperature=0.0)
    srv.run_until_drained(max_ticks=80)
    assert r2.done and r2.cached_prefix >= 16
    # the cached prefix survived the wrap: same prompt still hits and
    # reproduces r1's text exactly
    r3 = srv.submit(sys_prompt + "one", max_tokens=6, temperature=0.0)
    srv.run_until_drained(max_ticks=40)
    assert r3.cached_prefix >= 16
    assert r3.text == r1.text


def test_paged_prefix_eviction_unpins(model_path):
    """LRU eviction of a paged prefix entry releases its page pins back to
    the pool."""
    srv = Server(model_path, batch=1, kv_dtype="fp16",
                 page_rows=16, pool_pages=10, prefix_cache_tokens=40)
    srv.submit("abcd efgh " * 4 + "one", max_tokens=4, temperature=0.0)
    srv.run_until_drained(max_ticks=40)
    srv.submit("wxyz stuv " * 4 + "two", max_tokens=4, temperature=0.0)
    srv.run_until_drained(max_ticks=40)
    # capacity 40 tokens holds one ~32-token prefix: the first was evicted
    assert len(srv.prefix_cache._entries) == 1
    n_pages = len(srv._paged.page_refs)
    assert (len(srv._paged.free_pages)
            + int((srv._paged.page_refs > 0).sum())) == n_pages
    assert srv._paged.pages_in_use() == 0


def test_paged_dp_group_parity(model_path):
    """dp-sharded paged serving: one independent decoder per device, slots
    partitioned over them — outputs match the single-decoder paged server."""
    import jax
    prompts = ["AB", "zq", "hello world", "the quick"]

    plain = Server(model_path, batch=4, kv_dtype="fp16",
                   page_rows=16, pool_pages=16)
    want = [plain.submit(p, max_tokens=6, temperature=0.0) for p in prompts]
    plain.run_until_drained(max_ticks=40)

    srv = Server(model_path, batch=4, kv_dtype="fp16",
                 page_rows=16, dp_devices=jax.devices("cpu")[:2])
    got = [srv.submit(p, max_tokens=6, temperature=0.0) for p in prompts]
    srv.run_until_drained(max_ticks=40)
    assert srv._paged_group and len(srv._paged.decs) == 2
    assert all(r.done for r in got)
    assert [r.text for r in got] == [r.text for r in want]
    assert srv._paged.pages_in_use() == 0  # all pools drained


def test_paged_dp_group_device_sampling(model_path):
    """Greedy parity with sampling running on each dp shard's own device."""
    import jax
    prompts = ["AB", "zq", "hello world", "the quick"]
    host = Server(model_path, batch=4, kv_dtype="fp16",
                  page_rows=16, dp_devices=jax.devices("cpu")[:2])
    dev = Server(model_path, batch=4, kv_dtype="fp16",
                 page_rows=16, dp_devices=jax.devices("cpu")[:2],
                 device_sampling=True)
    outs = []
    for srv in (host, dev):
        rs = [srv.submit(p, max_tokens=6, temperature=0.0) for p in prompts]
        srv.run_until_drained(max_ticks=40)
        assert all(r.done for r in rs)
        outs.append([r.text for r in rs])
    assert outs[0] == outs[1]


def test_paged_dp_group_prefix_caches(model_path):
    """Per-shard prefix caches in dp-paged mode: a shard's second request
    with the same system prompt hits ITS cache; outputs stay exact."""
    import jax
    sys_prompt = "abcd efgh " * 4
    srv = Server(model_path, batch=2, kv_dtype="fp16", page_rows=16,
                 dp_devices=jax.devices("cpu")[:2],
                 prefix_cache_tokens=4096)
    assert srv._prefix_caches is not None and len(srv._prefix_caches) == 2
    # wave 1: one request per shard (slots 0 and 1), cold caches
    a1 = srv.submit(sys_prompt + "one", max_tokens=4, temperature=0.0)
    b1 = srv.submit(sys_prompt + "two", max_tokens=4, temperature=0.0)
    srv.run_until_drained(max_ticks=40)
    assert a1.cached_prefix == 0 and b1.cached_prefix == 0
    # wave 2: both shards hit their own cache
    a2 = srv.submit(sys_prompt + "one", max_tokens=4, temperature=0.0)
    b2 = srv.submit(sys_prompt + "two", max_tokens=4, temperature=0.0)
    srv.run_until_drained(max_ticks=40)
    assert a2.cached_prefix >= 16 and b2.cached_prefix >= 16
    assert [c.hits for c in srv._prefix_caches] == [1, 1]
    assert a2.text == a1.text and b2.text == b1.text


def test_http_server(model_path):
    """HTTP front-end: health, blocking generate, streaming generate, stats."""
    import json
    import threading
    import urllib.request

    from calm_tpu.httpd import serve_http

    srv = Server(model_path, batch=2, kv_dtype="fp16",
                 prefix_cache_tokens=1024)
    httpd = serve_http(srv, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/v1/health", timeout=30) as r:
            assert json.load(r)["status"] == "ok"

        body = json.dumps({"prompt": "AB", "max_tokens": 6,
                           "temperature": 0.0}).encode()
        req = urllib.request.Request(f"{base}/v1/generate", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
        assert out["tokens"] >= 1 and isinstance(out["text"], str)
        assert out["total_ms"] >= out["ttft_ms"] >= 0

        # streaming: chunked pieces concatenate to the same greedy text
        body = json.dumps({"prompt": "AB", "max_tokens": 6,
                           "temperature": 0.0, "stream": True}).encode()
        req = urllib.request.Request(f"{base}/v1/generate", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            streamed = r.read().decode()
        assert streamed == out["text"]

        with urllib.request.urlopen(f"{base}/v1/stats", timeout=30) as r:
            stats = json.load(r)
        assert stats["slots"] == 2
        assert stats["prefix_cache"]["entries"] >= 0
    finally:
        httpd.shutdown()
        httpd.scheduler.stop()


def test_http_dp_paged_stats(model_path):
    """HTTP stats aggregate per-shard prefix caches and report pool usage
    in dp-paged mode."""
    import json
    import threading
    import urllib.request

    import jax

    from calm_tpu.httpd import serve_http

    srv = Server(model_path, batch=2, kv_dtype="fp16", page_rows=16,
                 dp_devices=jax.devices("cpu")[:2],
                 prefix_cache_tokens=1024)
    httpd = serve_http(srv, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        body = json.dumps({"prompt": "abcd efgh " * 4, "max_tokens": 4,
                           "temperature": 0.0}).encode()
        req = urllib.request.Request(
            f"{base}/v1/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
        assert out["tokens"] >= 1
        with urllib.request.urlopen(f"{base}/v1/stats", timeout=30) as r:
            stats = json.load(r)
        assert stats["slots"] == 2
        assert stats["prefix_cache"]["entries"] >= 1  # pinned prompt pages
        assert stats["pages_in_use"] >= 0
    finally:
        httpd.shutdown()
        httpd.scheduler.stop()


# -- request lifecycle hardening (queue bound / deadline / cancellation) ----


def test_queue_full_rejects(model_path):
    from calm_tpu.serve import QueueFull

    srv = Server(model_path, batch=1, kv_dtype="fp16", max_pending=2)
    srv.submit("A", max_tokens=4)
    srv.submit("B", max_tokens=4)
    with pytest.raises(QueueFull):
        srv.submit("C", max_tokens=4)
    assert srv.rejected == 1
    srv.run_until_drained()  # the two accepted requests still complete


def test_pending_timeout(model_path):
    pieces = []
    srv = Server(model_path, batch=1, kv_dtype="fp16")
    req = srv.submit("AB", max_tokens=8, timeout_s=1e-9,
                     on_piece=pieces.append)
    srv.run_until_drained()
    assert req.done and req.timed_out and not req.n_generated
    assert pieces == [None]  # terminal sentinel, no text pieces
    assert req.done_event.is_set()


def test_active_timeout_partial_text(model_path):
    import time as _t

    srv = Server(model_path, batch=1, kv_dtype="fp16")
    req = srv.submit("AB", max_tokens=10_000, timeout_s=0.25)
    t0 = _t.perf_counter()
    srv.run_until_drained()
    assert req.done and req.timed_out
    assert req.n_generated >= 1  # it ran before the deadline hit
    assert _t.perf_counter() - t0 < 30
    # the slot is free for the next request
    assert not any(s.active for s in srv.slots)
    nxt = srv.submit("CD", max_tokens=4, temperature=0.0)
    srv.run_until_drained()
    assert nxt.done and not nxt.timed_out


def test_cancel_pending_and_active(model_path):
    srv = Server(model_path, batch=1, kv_dtype="fp16")
    first = srv.submit("AB", max_tokens=10_000)
    second = srv.submit("CD", max_tokens=4)

    srv.cancel(second)  # still pending: finalized immediately
    assert second.done and second.cancelled and second.done_event.is_set()

    srv.tick()  # admit + decode one step for `first`
    assert srv.slots[0].active
    srv.cancel(first)  # active: swept at the next tick
    assert not first.done
    srv.tick()
    assert first.done and first.cancelled
    assert not srv.slots[0].active
    srv.run_until_drained()  # nothing left


def test_finish_sentinel_on_normal_completion(model_path):
    pieces = []
    srv = Server(model_path, batch=1, kv_dtype="fp16")
    req = srv.submit("AB", max_tokens=4, temperature=0.0,
                     on_piece=pieces.append)
    srv.run_until_drained()
    assert req.done and pieces and pieces[-1] is None
    assert "".join(p for p in pieces if p) == req.text


def test_http_hardening(model_path):
    """429 on queue-full, 504 on deadline, disconnect mid-stream frees slot."""
    import json
    import socket
    import threading
    import time as _t
    import urllib.error
    import urllib.request

    from calm_tpu.httpd import serve_http

    srv = Server(model_path, batch=1, kv_dtype="fp16", max_pending=1)
    httpd = serve_http(srv, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(obj, timeout=120):
        body = json.dumps(obj).encode()
        r = urllib.request.Request(f"{base}/v1/generate", data=body,
                                   headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(r, timeout=timeout)

    try:
        # deadline -> 504 with partial text
        try:
            post({"prompt": "AB", "max_tokens": 100_000, "timeout_s": 0.2})
            assert False, "expected 504"
        except urllib.error.HTTPError as e:
            assert e.code == 504
            out = json.load(e)
            assert out["error"] == "deadline exceeded"

        # queue full -> 429: occupy the single slot with a long request,
        # fill the 1-deep pending queue, then a third submit must bounce
        bg = threading.Thread(
            target=lambda: urllib.request.urlopen(
                urllib.request.Request(
                    f"{base}/v1/generate",
                    data=json.dumps({"prompt": "AB",
                                     "max_tokens": 100_000,
                                     "timeout_s": 20}).encode()),
                timeout=120).read(),
            daemon=True)
        bg.start()
        deadline = _t.perf_counter() + 30
        while _t.perf_counter() < deadline:
            with httpd.scheduler.lock:
                if any(s.active for s in srv.slots):
                    break
            _t.sleep(0.01)
        httpd.scheduler.submit("P", max_tokens=4)  # fills pending (cap 1)
        try:
            post({"prompt": "Q", "max_tokens": 4})
            assert False, "expected 429"
        except urllib.error.HTTPError as e:
            assert e.code == 429
        # free the slot so the disconnect test below gets admitted promptly
        with httpd.scheduler.lock:
            for s in srv.slots:
                if s.active:
                    srv.cancel(s.req)

        # disconnect mid-stream: raw socket, read a little, slam it shut
        s = socket.create_connection(("127.0.0.1", port), timeout=30)
        body = json.dumps({"prompt": "AB", "max_tokens": 100_000,
                           "stream": True}).encode()
        s.sendall(b"POST /v1/generate HTTP/1.1\r\n"
                  b"Host: x\r\nContent-Type: application/json\r\n"
                  + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
        s.recv(4096)  # headers + maybe a first chunk
        s.close()
        deadline = _t.perf_counter() + 60
        freed = False
        while _t.perf_counter() < deadline:
            with httpd.scheduler.lock:
                freed = (not any(s2.active for s2 in srv.slots)
                         and not srv.pending)
            if freed:
                break
            _t.sleep(0.05)
        assert freed, "disconnected stream did not free its slot"
    finally:
        httpd.shutdown()
        httpd.scheduler.stop()


def test_paged_pool_invariants_soak(model_path):
    """Property soak of the paged pool under random admission, prefix
    hits, rolling-window CoW, LRU eviction, and pool pressure: after every
    tick, every pool page is exactly one of {free, slot-owned-exclusive,
    reference-counted (shared mapping / cache pin)}; refcounts never go
    negative; no page leaks or double-ownership."""
    import random

    rnd = random.Random(7)
    srv = Server(model_path, batch=3, kv_dtype="fp16", page_rows=8,
                 pool_pages=20, prefix_cache_tokens=120)
    dec = srv._paged

    def check():
        n = len(dec.page_refs)
        free = dec.free_pages
        assert len(set(free)) == len(free), "free list duplicate"
        assert all(0 <= p < n for p in free)
        assert all(dec.page_refs[p] == 0 for p in free), "free page ref'd"
        assert (dec.page_refs >= 0).all(), "negative refcount"
        owned = []
        for s in dec.slots:
            for j, p in enumerate(s.pages):
                assert p != dec.parking, "parking page mapped"
                assert p not in free, "page both mapped and free"
                if j in s.shared:
                    assert dec.page_refs[p] >= 1, "shared mapping unref'd"
                else:
                    owned.append(p)
        assert len(set(owned)) == len(owned), "exclusive page double-owned"
        refd = {p for p in range(n) if dec.page_refs[p] > 0}
        assert not (set(owned) & refd), "owned page still ref'd"
        assert set(free) | set(owned) | refd == set(range(n)), "page leaked"

    prefixes = ["abcd efgh ijkl ", "wxyz stuv qrst ", "mmmm nnnn "]
    live = []
    for i in range(40):
        p = rnd.choice(prefixes) * rnd.randint(1, 3) + f"x{i}"
        live.append(srv.submit(p, max_tokens=rnd.randint(1, 30),
                               temperature=0.0))
        for _ in range(rnd.randint(1, 6)):
            srv.tick()
            check()
    srv.run_until_drained(max_ticks=500)
    check()
    assert all(r.done for r in live)
    assert dec.pages_in_use() == 0  # slots drained; only cache pins remain


def test_sharded_server_gf4_fused(tmp_path):
    """The sharded server path applies per-shard gf4 fusion: naturals
    dropped on every shard, outputs match the plain (unsharded) server."""
    from calm_tpu.parallel import ShardingPlan, make_mesh

    cfg = tiny_config(dtype="gf4", seq_len=64)
    path = str(tmp_path / "g.calm")
    write_tiny_model(path, cfg, seed=1)

    plain = Server(path, batch=2)
    mesh = make_mesh(tp=2)
    shrd = Server(path, batch=2, mesh=mesh, plan=ShardingPlan(tp="tp"))
    assert shrd.engine.weights.layers.wq is None          # fused per shard
    assert shrd.engine.weights.layers.w1p is not None
    outs = []
    for srv in (plain, shrd):
        r1 = srv.submit("hello world", max_tokens=8, temperature=0.0)
        r2 = srv.submit("the quick", max_tokens=8, temperature=0.0)
        srv.run_until_drained(max_ticks=40)
        assert r1.done and r2.done
        outs.append((r1.text, r2.text))
    assert outs[0] == outs[1]


def test_speculative_server_parity(model_path, tmp_path):
    """Speculative continuous batching is greedy-EXACT: texts match the
    plain server both with a perfect draft (the target itself: every
    proposal accepted) and with a mismatching draft (different weights:
    corrections keep the emitted chain the target's argmaxes)."""
    prompts = ["hello world", "the quick", "pack my box"]

    plain = Server(model_path, batch=2, kv_dtype="fp16")
    want = [plain.submit(p, max_tokens=8, temperature=0.0) for p in prompts]
    plain.run_until_drained(max_ticks=60)
    want = [r.text for r in want]

    spec = Server(model_path, batch=2, kv_dtype="fp16",
                  draft_path=model_path, gamma=4)
    got = [spec.submit(p, max_tokens=8, temperature=0.0) for p in prompts]
    spec.run_until_drained(max_ticks=60)
    assert [r.text for r in got] == want
    assert spec.spec_rounds > 0
    assert spec.spec_accepted == spec.spec_emitted  # perfect draft

    dpath = str(tmp_path / "draft.calm")
    write_tiny_model(dpath, tiny_config(dtype="fp16", seq_len=64), seed=9)
    spec2 = Server(model_path, batch=2, kv_dtype="fp16",
                   draft_path=dpath, gamma=3)
    got2 = [spec2.submit(p, max_tokens=8, temperature=0.0)
            for p in prompts]
    spec2.run_until_drained(max_ticks=60)
    assert [r.text for r in got2] == want
    assert spec2.spec_rounds > 0


def test_speculative_server_mixed_sampling(model_path):
    """A sampled request in the batch suspends speculation (plain ticks
    keep the draft synced); the greedy request's text stays exact and
    speculation resumes once the batch is all-greedy again."""
    plain = Server(model_path, batch=2, kv_dtype="fp16")
    g = plain.submit("hello world", max_tokens=10, temperature=0.0)
    s = plain.submit("the quick", max_tokens=4, temperature=0.8, seed=3)
    plain.run_until_drained(max_ticks=60)

    spec = Server(model_path, batch=2, kv_dtype="fp16",
                  draft_path=model_path, gamma=4)
    g2 = spec.submit("hello world", max_tokens=10, temperature=0.0)
    s2 = spec.submit("the quick", max_tokens=4, temperature=0.8, seed=3)
    spec.run_until_drained(max_ticks=60)
    assert g2.text == g.text
    assert s2.text == s.text
    assert spec.spec_rounds > 0  # resumed after the sampled one drained


def test_speculative_server_with_prefix_cache(model_path):
    """Speculation composes with prompt prefix sharing: the target admits
    via cached rows + suffix prefill while the draft prefills the full
    prompt; outputs stay exact and the cache still hits."""
    sys_prompt = "abcd efgh " * 4
    plain = Server(model_path, batch=1, kv_dtype="fp16")
    w1 = plain.submit(sys_prompt + "one", max_tokens=6, temperature=0.0)
    plain.run_until_drained(max_ticks=40)
    w2 = plain.submit(sys_prompt + "two", max_tokens=6, temperature=0.0)
    plain.run_until_drained(max_ticks=40)

    spec = Server(model_path, batch=1, kv_dtype="fp16",
                  draft_path=model_path, gamma=4,
                  prefix_cache_tokens=4096)
    r1 = spec.submit(sys_prompt + "one", max_tokens=6, temperature=0.0)
    spec.run_until_drained(max_ticks=40)
    r2 = spec.submit(sys_prompt + "two", max_tokens=6, temperature=0.0)
    spec.run_until_drained(max_ticks=40)
    assert r2.cached_prefix > 0 and spec.prefix_cache.hits == 1
    assert r1.text == w1.text and r2.text == w2.text
    assert spec.spec_rounds > 0


def test_speculative_gamma_adapts(model_path, tmp_path):
    """Draft depth adapts to acceptance: a perfect draft holds the maximum
    gamma; a mismatching draft shrinks it (bounded at 1) — texts stay
    exact either way."""
    spec = Server(model_path, batch=1, kv_dtype="fp16",
                  draft_path=model_path, gamma=4)
    spec.submit("hello world", max_tokens=12, temperature=0.0)
    spec.run_until_drained(max_ticks=60)
    assert spec._gamma_now == 4  # perfect draft: never shrinks

    dpath = str(tmp_path / "bad_draft.calm")
    write_tiny_model(dpath, tiny_config(dtype="fp16", seq_len=64), seed=77)
    plain = Server(model_path, batch=1, kv_dtype="fp16")
    w = plain.submit("hello world", max_tokens=12, temperature=0.0)
    plain.run_until_drained(max_ticks=60)

    spec2 = Server(model_path, batch=1, kv_dtype="fp16",
                   draft_path=dpath, gamma=4)
    r = spec2.submit("hello world", max_tokens=12, temperature=0.0)
    spec2.run_until_drained(max_ticks=60)
    assert r.text == w.text                      # exactness regardless
    acc = spec2.spec_accepted / max(spec2.spec_emitted, 1)
    if acc < 0.4:                                # random draft: shrinks
        assert spec2._gamma_now < 4
    assert 1 <= spec2._gamma_now <= 4


def test_paged_server_tp_mesh_parity(model_path, tmp_path):
    """Paged serving under a tp=2 mesh: the pool shards over KV heads, the
    decode step runs under shard_map (page table replicated), admission
    prefills through the sharded path — outputs match the unsharded paged
    server, for fp16 AND for gf4 with per-shard fused layouts."""
    from calm_tpu.parallel import ShardingPlan, make_mesh

    prompts = ["hello world", "the quick", "pack my box"]

    def run(path, **kw):
        srv = Server(path, batch=2, page_rows=16, pool_pages=10, **kw)
        rs = [srv.submit(p, max_tokens=6, temperature=0.0) for p in prompts]
        srv.run_until_drained(max_ticks=60)
        assert all(r.done for r in rs)
        return srv, [r.text for r in rs]

    _, want = run(model_path, kv_dtype="fp16")
    mesh = make_mesh(tp=2)
    srv, got = run(model_path, kv_dtype="fp16", mesh=mesh,
                   plan=ShardingPlan(tp="tp"))
    assert srv._paged.mesh is not None
    assert got == want
    assert srv._paged.pages_in_use() == 0

    gpath = str(tmp_path / "g.calm")
    write_tiny_model(gpath, tiny_config(dtype="gf4", seq_len=64), seed=1)
    _, want_g = run(gpath)
    srv_g, got_g = run(gpath, mesh=make_mesh(tp=2),
                       plan=ShardingPlan(tp="tp"))
    assert srv_g._fused and srv_g.engine.weights.layers.w1 is None
    assert got_g == want_g


def test_paged_tp_mesh_prefix_cache(model_path):
    """Prefix pinning works in MESH-paged mode: pages are pool indices
    (host bookkeeping), the seeding copies stay shard-local; the second
    request hits and the output matches the cache-less mesh-paged run."""
    from calm_tpu.parallel import ShardingPlan, make_mesh

    sys_prompt = "abcd efgh " * 4
    plain = Server(model_path, batch=1, kv_dtype="fp16", page_rows=16,
                   pool_pages=10, mesh=make_mesh(tp=2),
                   plan=ShardingPlan(tp="tp"))
    w1 = plain.submit(sys_prompt + "one", max_tokens=6, temperature=0.0)
    plain.run_until_drained(max_ticks=40)
    w2 = plain.submit(sys_prompt + "two", max_tokens=6, temperature=0.0)
    plain.run_until_drained(max_ticks=40)

    srv = Server(model_path, batch=1, kv_dtype="fp16", page_rows=16,
                 pool_pages=10, mesh=make_mesh(tp=2),
                 plan=ShardingPlan(tp="tp"), prefix_cache_tokens=4096)
    r1 = srv.submit(sys_prompt + "one", max_tokens=6, temperature=0.0)
    srv.run_until_drained(max_ticks=40)
    r2 = srv.submit(sys_prompt + "two", max_tokens=6, temperature=0.0)
    srv.run_until_drained(max_ticks=40)
    assert r2.cached_prefix >= 16 and srv.prefix_cache.hits == 1
    assert r1.text == w1.text and r2.text == w2.text


def test_speculative_server_sampled_mode(model_path):
    """spec_sampled=True rejection-samples sampled requests inside
    speculative rounds: runs to completion, is deterministic across
    identical runs, and a perfect draft (target itself) accepts every
    proposal. Greedy requests in the same server stay EXACT."""
    def run():
        srv = Server(model_path, batch=2, kv_dtype="fp16",
                     draft_path=model_path, gamma=3, spec_sampled=True)
        s = srv.submit("the quick", max_tokens=10, temperature=0.8, seed=5)
        gr = srv.submit("hello world", max_tokens=10, temperature=0.0)
        srv.run_until_drained(max_ticks=80)
        assert s.done and gr.done
        return srv, s.text, gr.text

    srv1, s1, g1 = run()
    srv2, s2, g2 = run()
    assert s1 == s2 and g1 == g2          # deterministic given seeds
    assert srv1.spec_rounds > 0
    # perfect draft: p == q, acceptance prob 1 for every examined position
    assert srv1.spec_accepted == srv1.spec_emitted

    plain = Server(model_path, batch=2, kv_dtype="fp16")
    w = plain.submit("hello world", max_tokens=10, temperature=0.0)
    plain.run_until_drained(max_ticks=40)
    assert g1 == w.text                   # greedy exactness holds


def test_http_drain_and_access_log(model_path):
    """Graceful drain: finished requests emit one access-log record; after
    drain() new generates get 503 and the scheduler thread exits."""
    import json
    import threading
    import urllib.request
    import urllib.error

    from calm_tpu.httpd import serve_http

    records = []
    srv = Server(model_path, batch=1, kv_dtype="fp16")
    httpd = serve_http(srv, port=0, access_log=records.append)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        body = json.dumps({"prompt": "AB", "max_tokens": 4,
                           "temperature": 0.0}).encode()
        req = urllib.request.Request(
            f"{base}/v1/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert json.load(r)["tokens"] >= 1
        assert len(records) == 1
        assert records[0]["state"] == "ok" and records[0]["tokens"] >= 1
        assert records[0]["total_ms"] >= records[0]["ttft_ms"] > 0

        assert httpd.scheduler.drain(timeout_s=30)
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 503 while draining"
        except urllib.error.HTTPError as e:
            assert e.code == 503
        assert not httpd.scheduler.is_alive()
    finally:
        httpd.shutdown()
        httpd.scheduler.stop()


def test_speculative_server_soak(model_path):
    """Kitchen-sink soak: speculation + prefix cache + mixed temperatures
    + cancellations + tiny deadlines under random load. Every request must
    reach a terminal state with consistent bookkeeping; greedy slots never
    emit non-target tokens (spot-checked against a plain server)."""
    import random

    rnd = random.Random(3)
    srv = Server(model_path, batch=2, kv_dtype="fp16",
                 draft_path=model_path, gamma=3, spec_sampled=True,
                 prefix_cache_tokens=2048)
    prefixes = ["abcd efgh ijkl mnop ", "wxyz stuv "]
    live = []
    for i in range(25):
        p = rnd.choice(prefixes) + f"x{i}"
        temp = rnd.choice([0.0, 0.0, 0.8])
        kw = dict(max_tokens=rnd.randint(1, 20), temperature=temp,
                  seed=i)
        if rnd.random() < 0.15:
            kw["timeout_s"] = 0.001  # immediate deadline
        r = srv.submit(p, **kw)
        live.append((p, r))
        for _ in range(rnd.randint(0, 5)):
            srv.tick()
        if rnd.random() < 0.2 and not r.done:
            srv.cancel(r)
    srv.run_until_drained(max_ticks=600)
    assert all(r.done for _, r in live)
    for _, r in live:
        assert r.n_generated <= r.max_tokens
        assert r.finished_at >= r.submitted_at
    assert srv.spec_rounds > 0
    assert 0 <= srv.spec_accepted <= srv.spec_emitted

    # greedy exactness spot check: clean greedy requests reproduce on a
    # plain server text-for-text (speculation never emits non-argmaxes)
    plain = Server(model_path, batch=1, kv_dtype="fp16")
    checked = 0
    for (p, r) in live:
        if (r.cancelled or r.timed_out or r.temperature != 0.0
                or r.n_generated < r.max_tokens):
            continue
        w = plain.submit(p, max_tokens=r.max_tokens, temperature=0.0)
        plain.run_until_drained(max_ticks=80)
        assert r.text == w.text, p
        checked += 1
        if checked == 3:
            break
    assert checked > 0


def test_watchdog_detects_stall_and_recovers(model_path):
    """Liveness watchdog (SURVEY §5 failure detection): with a request in
    flight and the tick loop wedged, on_stall fires; once ticking resumes
    and drains, it stays quiet."""
    import time as _t

    srv = Server(model_path, batch=2, kv_dtype="fp16")
    fired = []
    srv.watchdog_start(stall_s=0.15, on_stall=fired.append, poll_s=0.02)
    try:
        # idle server: no requests -> never fires
        _t.sleep(0.4)
        assert not fired

        # wedged: a pending request but nobody ticks
        req = srv.submit("AB", max_tokens=6, temperature=0.0)
        _t.sleep(0.6)
        assert fired, "watchdog must fire while a request is starved"
        assert fired[0] >= 0.15

        # recovery: ticking resumes, request completes, no new firings
        srv.run_until_drained()
        assert req.done
        n = len(fired)
        _t.sleep(0.4)
        assert len(fired) == n
    finally:
        srv.watchdog_stop()
