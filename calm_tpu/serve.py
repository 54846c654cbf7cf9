"""Continuous-batching serving loop.

New scope vs the single-sequence reference (SURVEY.md §2.3): B decode slots
share one jitted decode step; finished slots are re-admitted with new
requests mid-flight.

Design:
- the KV cache is one (L, B, S, KVH, hd) buffer; admission prefills a single
  slot in place (model.prefill_slot) while other slots keep their state
- every scheduler tick runs ONE batched decode step for all slots; free
  slots decode garbage (their pos is parked) — cost is already paid by the
  batched matvecs, and their cache rows are masked/overwritten on reuse
- prompts are right-padded to bucket lengths so prefill compiles once per
  bucket, not once per prompt length
- sampling runs host-side per slot (greedy or min-p with per-request seeds)
"""

from __future__ import annotations

import dataclasses
import threading
import time
from collections import OrderedDict, deque
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from calm_tpu import model as M
from calm_tpu.engine import Engine
from calm_tpu.sampler import Sampler

BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


class QueueFull(Exception):
    """Raised by submit() when the pending queue is at max_pending."""


def bucket_len(n: int, seq_len: int) -> int:
    for b in BUCKETS:
        if n <= b and b <= seq_len:
            return b
    return seq_len


@dataclasses.dataclass
class Request:
    rid: int
    prompt: str
    max_tokens: int = 128
    temperature: float = 1.0
    minp: float = 0.1
    seed: int = 42
    # called with each decoded text piece, then ONCE with None when the
    # request reaches a terminal state (done/timeout/cancel) — the sentinel
    # lets streaming clients block on a queue instead of polling ``done``
    on_piece: Callable[[str | None], None] | None = None
    timeout_s: float = 0.0  # server-enforced deadline from submit (0 = none)
    # results
    text: str = ""
    done: bool = False
    cancelled: bool = False  # client went away: freed at the next tick
    timed_out: bool = False
    n_generated: int = 0
    cached_prefix: int = 0  # prompt tokens served from the prefix cache
    truncated_prompt: int = 0  # prompt tokens dropped to fit the window
                               # (left at 0 when the prompt fit; clients can
                               # check instead of being silently clipped)
    out_of_pages: bool = False  # paged mode: finished early under pool
                                # pressure (generation cut short)
    submitted_at: float = 0.0
    first_token_at: float = 0.0
    finished_at: float = 0.0
    # set exactly once, when the request reaches a terminal state; waiters
    # block here instead of polling ``done``
    done_event: threading.Event = dataclasses.field(
        default_factory=threading.Event, repr=False, compare=False)


@partial(jax.jit, static_argnames=("n",))
def _read_slot_rows(buf, slot, n):
    """(L, B, KVH, S, hd) -> the slot's first n cache rows (L, 1, KVH, n, hd)."""
    L, _, KVH, _, hd = buf.shape
    return jax.lax.dynamic_slice(buf, (0, slot, 0, 0, 0), (L, 1, KVH, n, hd))


@partial(jax.jit, donate_argnums=(0,))
def _write_slot_rows(buf, rows, slot):
    """In-place (donated) row copy: a prefix-cache hit must not cost a full
    multi-GiB cache copy per admission — XLA aliases the donated buffer and
    writes only the touched rows."""
    return jax.lax.dynamic_update_slice(buf, rows, (0, slot, 0, 0, 0))


class PrefixCache:
    """LRU store of prompt-prefix KV rows (vLLM-style prefix sharing, scoped
    to whole-prompt prefixes). New scope vs the reference (single-sequence,
    no server). Entries hold device-resident (k, v) row blocks for token
    prefixes starting at position 0 — RoPE'd keys are position-absolute, so
    a prefix block is valid for ANY request whose prompt starts with those
    tokens. Admission copies the longest hit into the slot and prefills only
    the suffix."""

    # saved prefixes are truncated to a multiple of this so the jitted
    # row-copy programs compile for a bounded set of lengths
    GRAIN = 16

    def __init__(self, capacity_tokens: int = 16384, on_evict=None):
        self.capacity = capacity_tokens
        self.tokens = 0
        self.hits = 0
        self.hit_tokens = 0
        self._entries: OrderedDict[tuple, tuple] = OrderedDict()
        # length -> stored keys of that length: match probes one hash per
        # DISTINCT stored length instead of scanning every entry
        self._lengths: dict[int, set] = {}
        # paged mode: entries hold pinned page lists instead of row blocks;
        # eviction must release the pins (PagedDecoder.unpin_pages)
        self._on_evict = on_evict

    def match(self, toks) -> tuple[int, tuple | None]:
        """Longest stored prefix of ``toks``; marks the entry most-recent."""
        for n in sorted(self._lengths, reverse=True):
            if n > len(toks):
                continue
            key = tuple(toks[:n])
            if key in self._lengths[n]:
                self._entries.move_to_end(key)
                self.hits += 1
                self.hit_tokens += n
                return n, self._entries[key]
        return 0, None

    def put(self, toks, *payload):
        key = tuple(toks)
        if key in self._entries:
            return
        self._entries[key] = payload if len(payload) != 1 else payload[0]
        self._lengths.setdefault(len(key), set()).add(key)
        self.tokens += len(key)
        while self.tokens > self.capacity and len(self._entries) > 1:
            old, pay = self._entries.popitem(last=False)
            self.tokens -= len(old)
            bucket = self._lengths.get(len(old))
            if bucket is not None:
                bucket.discard(old)
                if not bucket:
                    del self._lengths[len(old)]
            if self._on_evict is not None:
                self._on_evict(pay)


@dataclasses.dataclass
class _Slot:
    active: bool = False
    req: Request | None = None
    pos: int = 0
    token: int = 0
    sampler: Sampler | None = None
    out: bytearray = dataclasses.field(default_factory=bytearray)
    _save_prefix: list | None = None  # prefix-cache save deferred past the
                                      # admission prefill


class Server:
    """Batched multi-request decode on one Engine.

    device_sampling=True samples min-p ON DEVICE (calm_tpu.sampler.
    device_sample): only (B,) token ids cross to the host per tick instead
    of the full (B, V) logits. Per-request ``seed`` then selects the
    server-level PRNG stream rather than a bit-exact per-request xorshift
    stream — pass device_sampling=False for reference-compatible draws.

    Continuous batching scales ACROSS HOSTS: with a dp axis in ``plan`` the
    ``batch`` slots partition over the dp shards (batch % dp == 0), and
    under jax.distributed each process admits requests into its OWN shard's
    slots and samples only its local logits rows. Admissions are
    allgathered per tick so every process issues the identical SPMD prefill
    calls (only the owning shard's cache write survives —
    model.prefill_slot_fn); next-token/pos arrays reassemble from
    process-local rows. The reference is strictly single-sequence
    single-GPU (SURVEY.md §2.3).
    """

    def __init__(self, path: str, batch: int = 4, context: int = 0,
                 kv_dtype: str | None = None, device_sampling: bool = False,
                 seed: int = 42, mesh=None, plan=None,
                 prefix_cache_tokens: int = 0,
                 page_rows: int = 0, pool_pages: int = 0,
                 max_pending: int = 0, dp_devices=None,
                 draft_path: str | None = None, gamma: int = 4,
                 spec_sampled: bool = False):
        # optional sharded execution: weights/cache placed on the mesh, the
        # decode/prefill steps run under shard_map (continuous batching on a
        # tp/ep-sharded model; scale hosts with jax.distributed + dp shards)
        self._sharded = mesh is not None
        self.engine = Engine(path, context=context, kv_dtype=kv_dtype,
                             batch=batch, lazy_weights=self._sharded)
        self.batch = batch

        self._mesh, self._plan = mesh, plan
        self._pid = jax.process_index()
        self._nproc = jax.process_count()
        if self._sharded:
            from calm_tpu.parallel.sharding import (fuse_weights_sharded,
                                                    load_weights_sharded,
                                                    shard_cache,
                                                    sharded_decode_step,
                                                    sharded_prefill_slot)
            eng = self.engine
            if plan.dp is not None:
                assert batch % mesh.shape[plan.dp] == 0, \
                    "batch must divide over dp shards"
            # shard-aware load: this host materializes only its shards;
            # gf4 then gets the per-shard zero-copy layout fusion
            w = load_weights_sharded(eng.tf, eng.cfg, mesh, plan)
            eng.weights, fused = fuse_weights_sharded(w, eng.cfg, mesh,
                                                      plan)
            self._fused = fused
            if not page_rows:
                eng.cache = shard_cache(eng.cache, mesh, plan)
                self._decode_fn = sharded_decode_step(eng.cfg, mesh, plan,
                                                      fused=fused)
                self._prefill_slot_fn = sharded_prefill_slot(
                    eng.cfg, mesh, plan, fused=fused)
        # slot ownership: each process admits/samples only its contiguous
        # slot range (all slots on a single process; dp slots split over
        # processes in process order — make_multihost_mesh places dp on DCN)
        per = batch // self._nproc if self._nproc > 1 else batch
        self._own_lo = self._pid * per
        self._own_hi = batch if self._nproc == 1 else (self._pid + 1) * per
        # paged KV mode (calm_tpu/paged.py): slots draw attention-block-
        # sized pages from a shared pool — HBM follows the sum of live
        # context lengths instead of batch x seq_len. ``dp_devices`` scales
        # it out: one INDEPENDENT decoder (weights copy + pool) per listed
        # device, slots partitioned contiguously over them; decode is
        # batch-local so the shards need no collectives, and under
        # jax.distributed each process lists only its own local devices
        # (pool_pages is then PER SHARD).
        self._paged = None
        self._paged_group = False
        if page_rows:
            from calm_tpu.paged import PagedDecoder, PagedGroup
            eng = self.engine
            own = self._own_hi - self._own_lo
            assert self._nproc == 1 or dp_devices, \
                "multi-process paged serving needs dp_devices"
            if self._sharded:
                # paged pool + compute run tp/ep-SHARDED under the mesh
                # (dp scale-out composes via dp_devices, not the mesh)
                assert dp_devices is None and self._nproc == 1
                assert not device_sampling, \
                    "mesh-paged serving samples on host (vocab-sharded)"
                if not pool_pages:
                    pool_pages = batch * (eng.cfg.seq_len // page_rows)
                self._paged = PagedDecoder(eng.cfg, eng.weights, pool_pages,
                                           page_rows, eng._kv_jnp, batch,
                                           mesh=mesh, plan=plan,
                                           fused=self._fused)
            elif dp_devices is not None and (len(dp_devices) > 1
                                             or self._nproc > 1):
                assert own % len(dp_devices) == 0, \
                    "local slots must divide over dp devices"
                per = own // len(dp_devices)
                if not pool_pages:
                    pool_pages = per * (eng.cfg.seq_len // page_rows)
                self._paged = PagedGroup(eng.cfg, eng.weights, pool_pages,
                                         page_rows, eng._kv_jnp, per,
                                         dp_devices, own_lo=self._own_lo)
                self._paged_group = True
            else:
                if not pool_pages:
                    pool_pages = batch * (eng.cfg.seq_len // page_rows)
                dev = dp_devices[0] if dp_devices else None
                self._paged = PagedDecoder(eng.cfg, eng.weights, pool_pages,
                                           page_rows, eng._kv_jnp, batch,
                                           device=dev)
            eng.cache = None  # the pool replaces the dense cache
        # prompt prefix sharing (unsharded only: cached rows are host-managed
        # device blocks; the sharded cache would need per-shard row copies).
        # In paged mode the pages ARE the prefix unit: a hit PINS shared
        # pool pages (zero row copies for the decode working set) and a
        # save pins the slot's own prompt pages in place; eviction unpins.
        # dp-sharded paged mode keeps one cache PER decoder (pinned page
        # ids only mean something in the pool that owns them);
        # self.prefix_cache stays the single-cache surface otherwise.
        self.prefix_cache = None
        self._prefix_caches = None
        # mesh-paged mode CAN share prefixes: pages are pool indices and
        # the pin/CoW bookkeeping is host-side; the seeding copies are
        # sharded-array DUS (GSPMD keeps them per-shard-local)
        if prefix_cache_tokens and (not self._sharded
                                    or self._paged is not None):
            if self._paged_group:
                self._prefix_caches = [
                    PrefixCache(prefix_cache_tokens, on_evict=d.unpin_pages)
                    for d in self._paged.decs]
            elif self._paged is not None:
                self.prefix_cache = PrefixCache(
                    prefix_cache_tokens,
                    on_evict=self._paged.unpin_pages)
            else:
                self.prefix_cache = PrefixCache(prefix_cache_tokens)
        # speculative continuous batching (standalone single-stream version:
        # calm_tpu/speculative.py): a draft model proposes ``gamma`` tokens
        # per slot in ONE batched greedy scan, the target verifies every
        # slot's chain in ONE (B, gamma) forward, and each slot emits its
        # longest target-matching prefix plus the target's correction —
        # greedy-EXACT (only target argmaxes are ever emitted). Engaged per
        # tick only while every active request is greedy and away from the
        # window edge; otherwise plain ticks run and the draft cache is
        # stepped alongside to stay in sync.
        self._draft = None
        self.spec_sampled = spec_sampled  # rejection-sample sampled slots
        # inside speculative rounds (distributionally exact; draws come
        # from each slot's own xorshift stream but their COUNT depends on
        # acceptance, so texts differ from the plain server's by design)
        self.gamma = gamma          # maximum draft depth
        self._gamma_now = gamma     # adaptive: shrinks when the draft
        # misses often (each round costs a g-step draft scan + a (B, g)
        # verify; at low acceptance shallow rounds waste less), regrows on
        # sustained matches
        self.spec_rounds = self.spec_accepted = self.spec_emitted = 0
        if draft_path is not None:
            assert not self._sharded and not page_rows, \
                "speculative serving is dense single-device for now"
            self._draft = Engine(draft_path,
                                 context=self.engine.cfg.seq_len,
                                 kv_dtype=kv_dtype, batch=batch)
            assert (self._draft.cfg.vocab_size
                    == self.engine.cfg.vocab_size), \
                "draft and target must share the vocabulary"
            self._spec_key = jax.random.PRNGKey(seed ^ 0x5BD1)
        self.slots = [_Slot() for _ in range(batch)]
        self.pending: deque[Request] = deque()
        self.max_pending = max_pending  # 0 = unbounded
        self.rejected = 0  # submit() calls bounced on a full queue
        self._next_rid = 0
        # parked decode state per slot (device arrays built each tick)
        self._tokens = np.zeros(batch, np.int32)
        self._pos = np.zeros(batch, np.int32)
        self.device_sampling = device_sampling
        self._temps = np.zeros(batch, np.float32)  # parked slots: greedy
        self._minps = np.ones(batch, np.float32)
        if device_sampling:
            self._key = jax.random.PRNGKey(seed)
        self._last_tick_at = time.monotonic()  # watchdog liveness stamp
        self._wd_thread = None

    # -- client api ---------------------------------------------------------

    def submit(self, prompt: str, **kw) -> Request:
        if self.max_pending and len(self.pending) >= self.max_pending:
            self.rejected += 1
            raise QueueFull(f"pending queue full ({self.max_pending})")
        req = Request(rid=self._next_rid, prompt=prompt, **kw)
        req.submitted_at = time.perf_counter()
        self._next_rid += 1
        self.pending.append(req)
        return req

    def cancel(self, req: Request):
        """Client went away: a pending request is finalized immediately; an
        active one is swept (slot freed) at the start of the next tick."""
        req.cancelled = True
        if not req.done and any(r is req for r in self.pending):
            self.pending = deque(r for r in self.pending if r is not req)
            self._finish(req, None, time.perf_counter())

    def _finish(self, req: Request, b: int | None, now: float, *,
                timed_out: bool = False, out_of_pages: bool = False):
        """Single terminal path: park the slot, flag the request, fire the
        on_piece(None) sentinel, release the done_event."""
        if b is not None:
            slot = self.slots[b]
            req.text = slot.out.decode("utf-8", errors="replace")
            slot.active = False
            slot.req = None
            self._temps[b] = 0.0  # park the slot greedy; its garbage
            self._minps[b] = 1.0  # decodes are masked on reuse
            if self._paged is not None:
                self._paged.release(b)  # pages back to the pool
        req.timed_out = timed_out
        req.out_of_pages = out_of_pages
        req.done = True
        req.finished_at = now
        if req.on_piece:
            req.on_piece(None)
        req.done_event.set()

    def _sweep(self):
        """Free slots whose request was cancelled or passed its deadline,
        and drop dead pending requests, before admission."""
        now = time.perf_counter()

        def dead(req):
            to = (req.timeout_s > 0
                  and now - req.submitted_at >= req.timeout_s)
            return req.cancelled or to, to

        live = deque()
        for req in self.pending:
            is_dead, to = dead(req)
            if is_dead:
                self._finish(req, None, now, timed_out=to)
            else:
                live.append(req)
        self.pending = live
        for b in range(self._own_lo, self._own_hi):
            slot = self.slots[b]
            if not slot.active:
                continue
            is_dead, to = dead(slot.req)
            if is_dead:
                self._finish(slot.req, b, now, timed_out=to)

    # -- liveness watchdog ----------------------------------------------------

    def watchdog_start(self, stall_s: float = 60.0,
                       on_stall: Callable[[float], None] | None = None,
                       poll_s: float | None = None):
        """Start a liveness watchdog: if requests are in flight but no
        tick() has COMPLETED within ``stall_s`` (hung collective, wedged
        device, deadlocked scheduler), ``on_stall(age_seconds)`` fires
        (default: stderr diagnostic). Complements parallel.mesh.health_check
        (init-time fail-fast; this is runtime liveness — the reference's
        failure model is abort-on-error only, SURVEY §5). Idempotent;
        stop with watchdog_stop()."""
        import sys

        if getattr(self, "_wd_thread", None) is not None:
            return
        self._wd_stop = threading.Event()
        self._wd_fired = 0

        def _default(age: float):
            print(f"# watchdog: serving loop stalled for {age:.1f}s "
                  f"({sum(1 for s in self.slots if s.active)} active slots, "
                  f"{len(self.pending)} pending)", file=sys.stderr)

        cb = on_stall or _default
        poll = poll_s if poll_s is not None else max(stall_s / 4, 0.01)

        def _loop():
            while not self._wd_stop.wait(poll):
                busy = bool(self.pending) or any(
                    s.active
                    for s in self.slots[self._own_lo:self._own_hi])
                if not busy:
                    continue
                age = time.monotonic() - self._last_tick_at
                if age >= stall_s:
                    self._wd_fired += 1
                    try:
                        cb(age)
                    except Exception:
                        pass
                    # re-arm: don't spin the callback every poll
                    self._last_tick_at = time.monotonic()

        self._last_tick_at = time.monotonic()
        self._wd_thread = threading.Thread(target=_loop, daemon=True,
                                           name="calm-serve-watchdog")
        self._wd_thread.start()

    def watchdog_stop(self):
        t = getattr(self, "_wd_thread", None)
        if t is not None:
            self._wd_stop.set()
            t.join(timeout=5)
            self._wd_thread = None

    def run_until_drained(self, max_ticks: int | None = None):
        ticks = 0
        while True:
            live = bool(self.pending) or any(
                s.active for s in self.slots[self._own_lo:self._own_hi])
            if self._nproc > 1:
                from jax.experimental import multihost_utils
                live = bool(multihost_utils.process_allgather(
                    np.array([live], np.int32)).any())
            if not live:
                break
            self.tick()
            ticks += 1
            if max_ticks is not None and ticks >= max_ticks:
                break

    # -- scheduler ----------------------------------------------------------

    def _prefill_one(self, b: int, suffix: list[int], hit: int):
        """Run the (bucketed) suffix prefill for slot b. Under multi-process
        dp EVERY process calls this with identical arguments (SPMD); only
        the owning shard's cache write survives."""
        eng = self.engine
        T = bucket_len(len(suffix), eng.cfg.seq_len)
        if hit + T > eng.cfg.seq_len:
            T = eng.cfg.seq_len - hit  # keep writes in-window
        padded = np.zeros((1, T), np.int32)
        padded[0, : len(suffix)] = suffix
        if self._sharded:
            _, eng.cache = self._prefill_slot_fn(
                eng.weights, jnp.asarray(padded),
                jnp.int32(len(suffix)), jnp.int32(b), eng.cache)
        else:
            _, eng.cache = M.prefill_slot(
                eng.cfg, eng.weights, jnp.asarray(padded),
                jnp.int32(len(suffix)), jnp.int32(b), eng.cache,
                pos0=jnp.int32(hit))

    def _spec_ready(self) -> bool:
        """Speculate this tick? Every active request must be greedy —
        or sampled with ``spec_sampled`` on (per-slot rejection sampling)
        — and far enough from the window edge for a full gamma round plus
        the bonus row (the standalone horizon guard, speculative.py)."""
        S = self.engine.cfg.seq_len
        act = [s for s in self.slots if s.active]
        if not act:
            return False
        for s in act:
            if s.req.temperature != 0.0 and not self.spec_sampled:
                return False
            if s.pos + self._gamma_now + 2 >= S:
                return False
        return True

    def _tick_speculative(self):
        """One speculative round for the whole batch: draft scan (B, g),
        ONE target (B, g+1) verify forward, host acceptance per slot.

        Per slot the rule is greedy (longest argmax-matching prefix + the
        target's correction — only target argmaxes are ever emitted, so
        output is EXACT) or, for sampled requests under ``spec_sampled``,
        speculative REJECTION sampling with the slot's own xorshift stream
        (accept draft token x with prob min(1, p_t(x)/q_d(x)); a rejection
        resamples from max(p_t - q_d, 0) — distributionally exact,
        speculative.py:269-300). A fully-accepting slot takes one BONUS
        token from verify row g. Cache rows past a slot's stop are
        stale-but-masked and overwritten by later writes."""
        from calm_tpu.speculative import _minp_probs
        eng, draft, g = self.engine, self._draft, self._gamma_now
        tok = eng.tokenizer
        tokens = jnp.asarray(self._tokens)
        pos = jnp.asarray(self._pos)
        pos_before = self._pos.copy()
        sampled_round = any(
            s.active and s.req.temperature > 0.0
            for s in self.slots[self._own_lo:self._own_hi])
        # 1) draft proposes g tokens per slot (one device scan): greedy
        #    argmaxes, or per-slot min-p draws (parked/greedy slots have
        #    temp 0 -> argmax) with the per-step logits kept for q_d
        if sampled_round:
            self._spec_key, sub = jax.random.split(self._spec_key)
            d_toks, draft.cache, d_logits = M.decode_scan_sampled(
                draft.cfg, draft.weights, tokens, pos, draft.cache, g,
                sub, jnp.asarray(self._temps), jnp.asarray(self._minps),
                rolling=False)
            d_logits = np.asarray(d_logits, np.float32)    # (g, B, V)
        else:
            d_toks, draft.cache, _ = M.decode_scan(
                draft.cfg, draft.weights, tokens, pos, draft.cache, g,
                rolling=False)
            d_logits = None
        proposal = np.asarray(d_toks)                      # (B, g)
        # 2) the target scores every slot's chain in one forward:
        #    row i judges proposal[i]; row g is the bonus distribution
        verify = np.concatenate([self._tokens[:, None], proposal],
                                axis=1).astype(np.int32)
        t_logits, eng.cache = M.prefill(
            eng.cfg, eng.weights, jnp.asarray(verify), pos, eng.cache,
            logits_mode="all")
        t_np = np.asarray(t_logits, np.float32)            # (B, g+1, V)
        t_args = t_np.argmax(-1)
        # 3) per-slot acceptance
        now = time.perf_counter()
        self.spec_rounds += 1
        round_match = round_seen = 0
        full_accept = np.zeros(self.batch, bool)
        for b in range(self._own_lo, self._own_hi):
            slot = self.slots[b]
            if not slot.active:
                continue
            req = slot.req
            emitted: list[int] = []
            n_match = 0
            if req.temperature == 0.0:
                for i in range(g):
                    nxt = int(t_args[b, i])
                    emitted.append(nxt)
                    if nxt != int(proposal[b, i]):
                        break
                    n_match += 1
                else:
                    emitted.append(int(t_args[b, g]))      # bonus
            else:
                rng = slot.sampler.rng
                for i in range(g):
                    p = _minp_probs(t_np[b, i], req.temperature, req.minp)
                    q = _minp_probs(d_logits[i, b], req.temperature,
                                    req.minp)
                    x = int(proposal[b, i])
                    if q[x] > 0 and rng.next_f32() < min(
                            1.0, float(p[x] / q[x])):
                        emitted.append(x)
                        n_match += 1
                        continue
                    resid = np.maximum(p - q, 0.0)
                    s = resid.sum(dtype=np.float32)
                    if s <= 0:
                        resid, s = p, p.sum(dtype=np.float32)
                    r = rng.next_f32() * s
                    emitted.append(int(min(
                        np.searchsorted(np.cumsum(resid), r),
                        len(resid) - 1)))
                    break
                else:
                    p = _minp_probs(t_np[b, g], req.temperature, req.minp)
                    r = rng.next_f32()
                    emitted.append(int(min(
                        np.searchsorted(np.cumsum(p), r * p.sum()),
                        len(p) - 1)))
            full_accept[b] = n_match == g
            self.spec_accepted += n_match
            self.spec_emitted += min(len(emitted), g)
            round_match += n_match
            round_seen += min(len(emitted), g)
            for nxt in emitted:
                if req.n_generated == 0:
                    req.first_token_at = now
                slot.pos += 1
                req.n_generated += 1
                stop = (nxt in (tok.bos_id, tok.eos_id, tok.eot_id)
                        or req.n_generated >= req.max_tokens)
                if stop:
                    self._finish(req, b, now)
                    break
                piece = tok.decode_piece(slot.token, nxt)
                slot.out += piece
                if req.on_piece:
                    req.on_piece(piece.decode("utf-8", errors="replace"))
                slot.token = nxt
                self._tokens[b] = nxt
                self._pos[b] = slot.pos
        # 4) backfill the draft rows the scan never wrote: a full-accepting
        #    slot's proposal[-1] row at p0+g would stay a hole forever
        #    (speculative.py:302-311); other slots re-write their CURRENT
        #    token at its own position — idempotent with the next round
        if full_accept.any():
            bf_tok = np.where(full_accept, proposal[:, -1], self._tokens)
            bf_pos = np.where(full_accept, pos_before + g, self._pos)
            _, draft.cache = M.decode_step(
                draft.cfg, draft.weights, jnp.asarray(bf_tok, jnp.int32),
                jnp.asarray(bf_pos, jnp.int32), draft.cache, rolling=False)
        # adapt the draft depth to the observed acceptance (each distinct
        # depth compiles one draft-scan program; the set is bounded by
        # [1, gamma])
        rate = round_match / max(round_seen, 1)
        if rate >= 0.8:
            self._gamma_now = min(self.gamma, self._gamma_now + 1)
        elif rate < 0.4:
            self._gamma_now = max(1, self._gamma_now - 1)

    def _slot_prefix_cache(self, b: int):
        """The prefix cache that can serve slot b: dp-sharded paged mode
        keeps one per decoder (pinned page ids are pool-local)."""
        if self._prefix_caches is not None:
            return self._prefix_caches[self._paged.shard_of(b)]
        return self.prefix_cache

    def _admit(self):
        eng = self.engine
        admissions: list[tuple[int, list[int], int]] = []
        draft_pre: list[tuple[int, list[int]]] = []
        for b in range(self._own_lo, self._own_hi):
            slot = self.slots[b]
            if slot.active or not self.pending:
                continue
            req = self.pending.popleft()
            toks = eng.tokenizer.encode(req.prompt, bos=True)
            if not toks:
                toks = [max(eng.tokenizer.bos_id, 0)]
            if len(toks) > eng.cfg.seq_len - 1:
                # clamp absurd prompts to the window minus generation room
                req.truncated_prompt = len(toks) - (eng.cfg.seq_len - 1)
                toks = toks[: eng.cfg.seq_len - 1]

            if self._paged is not None:
                pre = toks[:-1]
                pc = self._slot_prefix_cache(b)
                hit, pages = 0, ()
                if pc is not None:
                    hit, pages = pc.match(pre)
                    if not hit:
                        pages = ()
                if not self._paged.admit(b, toks, shared_pages=pages,
                                         hit_rows=hit):
                    self.pending.appendleft(req)  # pool full: retry later
                    break
                req.cached_prefix = min(hit, len(pre))
                if pc is not None:
                    # zero-copy save: pin the full prompt pages in place
                    pr = self._paged.page_rows
                    rows_p = len(pre) // pr * pr
                    key = tuple(pre[:rows_p])
                    if rows_p and key not in pc._entries:
                        _, pinned = self._paged.pin_prompt(b, rows_p)
                        if pinned:
                            pc.put(key, pinned)

            slot.active = True
            slot.req = req
            slot.sampler = Sampler(eng.cfg.vocab_size, req.seed,
                                   req.temperature, req.minp)
            self._temps[b] = req.temperature
            self._minps[b] = req.minp
            slot.out = bytearray()
            slot.token = toks[-1]
            slot.pos = len(toks) - 1
            self._tokens[b] = slot.token
            self._pos[b] = slot.pos

            if self._paged is not None:
                continue  # admission prefill already ran in the pool
            if len(toks) > 1:
                pre = toks[:-1]
                hit = 0
                if self.prefix_cache is not None:
                    hit, kv = self.prefix_cache.match(pre)
                    if hit:
                        # copy the cached rows into the slot BEFORE the
                        # suffix prefill so the suffix attends to them
                        eng.cache = M.KVCache(
                            _write_slot_rows(eng.cache.k, kv[0], jnp.int32(b)),
                            _write_slot_rows(eng.cache.v, kv[1], jnp.int32(b)))
                req.cached_prefix = hit
                suffix = pre[hit:]
                if suffix:
                    admissions.append((b, suffix, hit))
                if self.prefix_cache is not None:
                    # defer the save until after the prefill runs below
                    slot._save_prefix = pre
                if self._draft is not None:
                    # the draft has no prefix cache: it prefills the FULL
                    # prompt into its own slot
                    draft_pre.append((b, pre))

        for b, suffix, hit in self._merge_admissions(admissions):
            self._prefill_one(b, suffix, hit)

        for b, pre in draft_pre:
            d = self._draft
            T = bucket_len(len(pre), d.cfg.seq_len)
            padded = np.zeros((1, T), np.int32)
            padded[0, : len(pre)] = pre
            _, d.cache = M.prefill_slot(
                d.cfg, d.weights, jnp.asarray(padded),
                jnp.int32(len(pre)), jnp.int32(b), d.cache,
                pos0=jnp.int32(0))

        if self.prefix_cache is not None:
            for b in range(self._own_lo, self._own_hi):
                slot = self.slots[b]
                pre = slot._save_prefix
                if pre is None:
                    continue
                slot._save_prefix = None
                save_n = len(pre) // PrefixCache.GRAIN * PrefixCache.GRAIN
                if save_n >= PrefixCache.GRAIN:
                    key = tuple(pre[:save_n])
                    if key not in self.prefix_cache._entries:
                        self.prefix_cache.put(
                            key,
                            _read_slot_rows(eng.cache.k, jnp.int32(b), save_n),
                            _read_slot_rows(eng.cache.v, jnp.int32(b), save_n))

    def _merge_admissions(self, local):
        """Single process: pass through. Multi-process: allgather so every
        process replays the SAME prefill sequence (deterministic order by
        process id, then slot)."""
        if self._nproc == 1:
            return local
        from jax.experimental import multihost_utils
        S = self.engine.cfg.seq_len
        cap = self._own_hi - self._own_lo
        buf = np.full((cap, 3 + S), -1, np.int32)
        for i, (b, suffix, hit) in enumerate(local):
            buf[i, 0] = b
            buf[i, 1] = len(suffix)
            buf[i, 2] = hit
            buf[i, 3 : 3 + len(suffix)] = suffix
        gathered = multihost_utils.process_allgather(buf)  # (nproc, cap, 3+S)
        merged = []
        for p in range(gathered.shape[0]):
            for i in range(cap):
                if gathered[p, i, 0] < 0:
                    continue
                n = int(gathered[p, i, 1])
                merged.append((int(gathered[p, i, 0]),
                               [int(t) for t in gathered[p, i, 3 : 3 + n]],
                               int(gathered[p, i, 2])))
        return merged

    def _global_batch_arr(self, arr: np.ndarray):
        """Host (B,) array -> device array sharded over dp (multi-process:
        assembled from this process's own rows)."""
        if self._nproc == 1:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self._mesh, P(self._plan.dp))
        return jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(arr[self._own_lo:self._own_hi]))

    def _own_rows(self, arr) -> np.ndarray:
        """Fetch this process's slot rows of a (B, ...) device array (the
        full array is not addressable across processes)."""
        if self._nproc == 1:
            return np.asarray(arr)[self._own_lo:self._own_hi]
        shape = (self._own_hi - self._own_lo,) + tuple(arr.shape[1:])
        out = np.zeros(shape, arr.dtype)
        for s in arr.addressable_shards:
            idx = list(s.index)
            r = idx[0]
            r0 = 0 if r.start is None else int(r.start)
            r1 = arr.shape[0] if r.stop is None else int(r.stop)
            out[(slice(r0 - self._own_lo, r1 - self._own_lo),)
                + tuple(idx[1:])] = np.asarray(s.data)
        return out

    def tick(self):
        """One scheduler tick: admit new requests, one decode step for all.
        Under multi-process dp every process must call tick() in lockstep
        (run_until_drained does)."""
        out = self._tick()
        # watchdog liveness stamp AFTER a successful tick only: a serving
        # loop that catches and retries a continuously-raising _tick() must
        # look STALLED to the watchdog (that failure mode is exactly what
        # it exists to catch), so a raise propagates without stamping
        self._last_tick_at = time.monotonic()
        return out

    def _tick(self):
        self._sweep()
        self._admit()
        active = any(s.active
                     for s in self.slots[self._own_lo:self._own_hi])
        if self._nproc > 1:
            from jax.experimental import multihost_utils
            active = bool(multihost_utils.process_allgather(
                np.array([active], np.int32)).any())
        if not active:
            return

        eng = self.engine
        if self._paged is not None:
            now0 = time.perf_counter()
            for b in range(self._own_lo, self._own_hi):  # sync decode core
                slot = self.slots[b]
                if not slot.active:
                    continue
                self._paged.set_token(b, slot.token)
                if not self._paged.ensure_capacity(b):
                    # pool pressure: finish this request early with what it
                    # has (flagged) instead of stalling the whole batch
                    self._finish(slot.req, b, now0, out_of_pages=True)
            if not any(s.active
                       for s in self.slots[self._own_lo:self._own_hi]):
                return
            # both sampled and logits come back ALREADY restricted to this
            # process's own rows (PagedGroup returns local shards; the
            # single decoder's batch IS the own range)
            if self.device_sampling:
                self._key, sub = jax.random.split(self._key)
                lo, hi = self._own_lo, self._own_hi
                sampled = self._paged.step_sampled(
                    sub, self._temps[lo:hi], self._minps[lo:hi])
                logits = None
            else:
                logits = np.asarray(self._paged.step(), np.float32)
        elif self._sharded:
            logits, eng.cache = self._decode_fn(
                eng.weights, self._global_batch_arr(self._tokens),
                self._global_batch_arr(self._pos), eng.cache)
        elif self._draft is not None and self._spec_ready():
            self._tick_speculative()
            return
        else:
            rolling = bool(np.any(self._pos + 1 >= eng.cfg.seq_len))
            logits, eng.cache = M.decode_step(
                eng.cfg, eng.weights,
                jnp.asarray(self._tokens), jnp.asarray(self._pos), eng.cache,
                rolling=rolling)
            if self._draft is not None:
                # keep the draft's cache in sync through plain ticks (a
                # sampled request or the window edge disables speculation,
                # not the draft) — rolling mechanics are pos-deterministic,
                # so both caches stay consistent
                d = self._draft
                _, d.cache = M.decode_step(
                    d.cfg, d.weights, jnp.asarray(self._tokens),
                    jnp.asarray(self._pos), d.cache, rolling=rolling)

        if self._paged is None:
            if self.device_sampling:
                from calm_tpu.sampler import device_sample
                self._key, sub = jax.random.split(self._key)
                sampled = self._own_rows(device_sample(
                    logits, sub, self._global_batch_arr(self._temps),
                    self._global_batch_arr(self._minps)))
                logits = None
            else:
                logits = self._own_rows(logits).astype(np.float32)

        tok = eng.tokenizer
        now = time.perf_counter()
        for b in range(self._own_lo, self._own_hi):
            slot = self.slots[b]
            if not slot.active:
                continue
            req = slot.req
            lb = b - self._own_lo
            nxt = (int(sampled[lb]) if self.device_sampling
                   else slot.sampler.sample(logits[lb].copy()))
            if req.n_generated == 0:
                req.first_token_at = now
            slot.pos += 1
            req.n_generated += 1
            stop = (nxt in (tok.bos_id, tok.eos_id, tok.eot_id)
                    or req.n_generated >= req.max_tokens)
            if not stop:
                piece = tok.decode_piece(slot.token, nxt)
                slot.out += piece
                if req.on_piece:
                    req.on_piece(piece.decode("utf-8", errors="replace"))
                slot.token = nxt
                self._tokens[b] = nxt
                self._pos[b] = slot.pos
            else:
                self._finish(req, b, now)
