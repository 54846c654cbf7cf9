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
    on_piece: Callable[[str], None] | None = None
    # results
    text: str = ""
    done: bool = False
    n_generated: int = 0
    cached_prefix: int = 0  # prompt tokens served from the prefix cache
    submitted_at: float = 0.0
    first_token_at: float = 0.0
    finished_at: float = 0.0


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

    def __init__(self, capacity_tokens: int = 16384):
        self.capacity = capacity_tokens
        self.tokens = 0
        self.hits = 0
        self.hit_tokens = 0
        self._entries: OrderedDict[tuple, tuple] = OrderedDict()

    def match(self, toks) -> tuple[int, tuple | None]:
        """Longest stored prefix of ``toks``; marks the entry most-recent."""
        best_len, best_key = 0, None
        for key in self._entries:
            n = len(key)
            if best_len < n <= len(toks) and tuple(toks[:n]) == key:
                best_len, best_key = n, key
        if best_key is None:
            return 0, None
        self._entries.move_to_end(best_key)
        self.hits += 1
        self.hit_tokens += best_len
        return best_len, self._entries[best_key]

    def put(self, toks, k_rows, v_rows):
        key = tuple(toks)
        if key in self._entries:
            return
        self._entries[key] = (k_rows, v_rows)
        self.tokens += len(key)
        while self.tokens > self.capacity and len(self._entries) > 1:
            old, _ = self._entries.popitem(last=False)
            self.tokens -= len(old)


@dataclasses.dataclass
class _Slot:
    active: bool = False
    req: Request | None = None
    pos: int = 0
    token: int = 0
    sampler: Sampler | None = None
    out: bytearray = dataclasses.field(default_factory=bytearray)


class Server:
    """Batched multi-request decode on one Engine.

    device_sampling=True samples min-p ON DEVICE (calm_tpu.sampler.
    device_sample): only (B,) token ids cross to the host per tick instead
    of the full (B, V) logits. Per-request ``seed`` then selects the
    server-level PRNG stream rather than a bit-exact per-request xorshift
    stream — pass device_sampling=False for reference-compatible draws.
    """

    def __init__(self, path: str, batch: int = 4, context: int = 0,
                 kv_dtype: str | None = None, device_sampling: bool = False,
                 seed: int = 42, mesh=None, plan=None,
                 prefix_cache_tokens: int = 0):
        self.engine = Engine(path, context=context, kv_dtype=kv_dtype,
                             batch=batch)
        self.batch = batch

        # optional sharded execution: weights/cache placed on the mesh, the
        # decode/prefill steps run under shard_map (continuous batching on a
        # tp/ep-sharded model; scale hosts with jax.distributed + dp shards)
        self._sharded = mesh is not None
        if self._sharded:
            from calm_tpu.parallel.sharding import (shard_cache,
                                                    shard_weights,
                                                    sharded_decode_step,
                                                    sharded_prefill_slot)
            eng = self.engine
            eng.weights = shard_weights(eng.weights, eng.cfg, mesh, plan)
            eng.cache = shard_cache(eng.cache, mesh, plan)
            self._decode_fn = sharded_decode_step(eng.cfg, mesh, plan)
            self._prefill_slot_fn = sharded_prefill_slot(eng.cfg, mesh, plan)
        # prompt prefix sharing (unsharded only: cached rows are host-managed
        # device blocks; the sharded cache would need per-shard row copies)
        self.prefix_cache = (PrefixCache(prefix_cache_tokens)
                             if prefix_cache_tokens and not self._sharded
                             else None)
        self.slots = [_Slot() for _ in range(batch)]
        self.pending: deque[Request] = deque()
        self._next_rid = 0
        # parked decode state per slot (device arrays built each tick)
        self._tokens = np.zeros(batch, np.int32)
        self._pos = np.zeros(batch, np.int32)
        self.device_sampling = device_sampling
        self._temps = np.zeros(batch, np.float32)  # parked slots: greedy
        self._minps = np.ones(batch, np.float32)
        if device_sampling:
            import jax
            self._key = jax.random.PRNGKey(seed)

    # -- client api ---------------------------------------------------------

    def submit(self, prompt: str, **kw) -> Request:
        req = Request(rid=self._next_rid, prompt=prompt, **kw)
        req.submitted_at = time.perf_counter()
        self._next_rid += 1
        self.pending.append(req)
        return req

    def run_until_drained(self, max_ticks: int | None = None):
        ticks = 0
        while self.pending or any(s.active for s in self.slots):
            self.tick()
            ticks += 1
            if max_ticks is not None and ticks >= max_ticks:
                break

    # -- scheduler ----------------------------------------------------------

    def _admit(self):
        eng = self.engine
        for b, slot in enumerate(self.slots):
            if slot.active or not self.pending:
                continue
            req = self.pending.popleft()
            toks = eng.tokenizer.encode(req.prompt, bos=True)
            if not toks:
                toks = [max(eng.tokenizer.bos_id, 0)]
            # clamp absurd prompts to the window minus generation room
            max_prompt = eng.cfg.seq_len - 1
            toks = toks[:max_prompt]

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
                if self.prefix_cache is not None:
                    save_n = len(pre) // PrefixCache.GRAIN * PrefixCache.GRAIN
                    if save_n >= PrefixCache.GRAIN:
                        key = tuple(pre[:save_n])
                        if key not in self.prefix_cache._entries:
                            self.prefix_cache.put(
                                key,
                                _read_slot_rows(eng.cache.k, jnp.int32(b), save_n),
                                _read_slot_rows(eng.cache.v, jnp.int32(b), save_n))

    def tick(self):
        """One scheduler tick: admit new requests, one decode step for all."""
        self._admit()
        if not any(s.active for s in self.slots):
            return

        eng = self.engine
        if self._sharded:
            logits, eng.cache = self._decode_fn(
                eng.weights, jnp.asarray(self._tokens),
                jnp.asarray(self._pos), eng.cache)
        else:
            logits, eng.cache = M.decode_step(
                eng.cfg, eng.weights,
                jnp.asarray(self._tokens), jnp.asarray(self._pos), eng.cache)

        if self.device_sampling:
            import jax
            from calm_tpu.sampler import device_sample
            self._key, sub = jax.random.split(self._key)
            sampled = np.asarray(device_sample(
                logits, sub, jnp.asarray(self._temps),
                jnp.asarray(self._minps)))
            logits = None
        else:
            logits = np.asarray(logits, np.float32)

        tok = eng.tokenizer
        now = time.perf_counter()
        for b, slot in enumerate(self.slots):
            if not slot.active:
                continue
            req = slot.req
            nxt = (int(sampled[b]) if self.device_sampling
                   else slot.sampler.sample(logits[b].copy()))
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
                req.text = slot.out.decode("utf-8", errors="replace")
                req.done = True
                req.finished_at = now
                slot.active = False
                slot.req = None
                self._temps[b] = 0.0  # park the slot greedy; its garbage
                self._minps[b] = 1.0  # decodes are masked on reuse
