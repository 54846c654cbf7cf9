"""Paged KV cache: block-table attention over a shared page pool.

Beyond reference parity (the reference is single-sequence with one dense
window, SURVEY.md §2.3): decode slots draw attention-block-sized pages from
one physical pool instead of each owning a dense seq_len window, so HBM
capacity follows the SUM of live context lengths, not slots x seq_len.

TPU-native design choice: pages are LARGE (the decode-attention kernel's
S-block, >=512 rows) because per-grid-step DMAs below ~1 MB collapse HBM
throughput on v5e (docs/PERF_NOTES.md) — this is coarse-grained paging for
capacity/fragmentation reclaim, not GPU-style 16-row paging. The kernel
body is unchanged: the page table rides the scalar-prefetch operand and
redirects the KV BlockSpec index map (calm_tpu/ops/pallas_attn.py), the
same mechanism the layered qmm kernel uses for layer indexing.

Layout: pool (L, n_pages, KVH, page_rows, hd); slot b's logical window row
r lives in page pt[b, r // page_rows] at row r % page_rows. Sinks + rolling
window keep their logical index math (model.decode_indices) — wrapping
reuses the slot's existing pages, so a slot never needs more than
ceil(seq_len / page_rows) pages no matter how long it decodes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from calm_tpu import model as M
from calm_tpu.config import ModelConfig


def paged_decode_step_fn(cfg: ModelConfig, w, token, pos, cache, pt,
                         rolling: bool = True, plan=None):
    """One token per slot on a PAGED cache: token/pos (B,), cache the
    (L, P, KVH, PR, hd) pool, pt (B, seq_len//PR) int32 page table ->
    (logits (B, V), cache). ``plan`` (tp/ep) makes it the shard_map body
    for a MESHED pool — the page table is replicated; every pt-indexed
    write lands on the page/row axes, so each shard updates its own KVH
    slice with zero extra collectives."""
    from calm_tpu.parallel.plan import NO_SHARDING
    kv_pos, kv_len = M.decode_indices(cfg, pos)
    return M._forward(cfg, w, token[:, None], pos[:, None], kv_pos[:, None],
                      kv_len, cache, rolling=rolling, logits_mode="last",
                      pt=pt, plan=plan or NO_SHARDING)


paged_decode_step = jax.jit(paged_decode_step_fn,
                            static_argnames=("cfg", "rolling"),
                            donate_argnames=("cache",))


def create_pool(cfg: ModelConfig, n_pages: int, page_rows: int,
                dtype=jnp.bfloat16) -> M.KVCache:
    shape = (cfg.n_layers, n_pages, cfg.n_kv_heads, page_rows, cfg.head_dim)
    return M.KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


@partial(jax.jit, donate_argnums=(0,), static_argnames=("page_rows",))
def _copy_rows_to_page(pool, dense, blk, page, page_rows: int):
    """Move rows [blk*PR, (blk+1)*PR) of a dense single-slot cache buffer
    (L, 1, KVH, S, hd) into pool page ``page`` (donated, in-place). The
    dense buffer spans the full window (S % PR == 0), so slices never
    clamp."""
    L, _, KVH, S, hd = dense.shape
    rows = jax.lax.dynamic_slice(dense, (0, 0, 0, blk * page_rows, 0),
                                 (L, 1, KVH, page_rows, hd))
    return jax.lax.dynamic_update_slice(pool, rows, (0, page, 0, 0, 0))


@partial(jax.jit, donate_argnums=(0,), static_argnames=("page_rows",))
def _copy_page_to_rows(dense, pool, blk, page, page_rows: int):
    """Seed rows [blk*PR, (blk+1)*PR) of a dense single-slot buffer from
    pool page ``page`` (the prefix-hit scratch seeding: the suffix prefill
    must attend over the shared prefix rows)."""
    L, P, KVH, PR, hd = pool.shape
    rows = jax.lax.dynamic_slice(pool, (0, page, 0, 0, 0),
                                 (L, 1, KVH, PR, hd))
    return jax.lax.dynamic_update_slice(dense, rows,
                                        (0, 0, 0, blk * page_rows, 0))


@partial(jax.jit, donate_argnums=(0,))
def _copy_page_to_page(pool, src, dst):
    """Copy-on-write: duplicate page ``src`` into ``dst`` (donated)."""
    L, P, KVH, PR, hd = pool.shape
    rows = jax.lax.dynamic_slice(pool, (0, src, 0, 0, 0),
                                 (L, 1, KVH, PR, hd))
    return jax.lax.dynamic_update_slice(pool, rows, (0, dst, 0, 0, 0))


@dataclasses.dataclass
class _PagedSlot:
    active: bool = False
    pages: list = dataclasses.field(default_factory=list)
    pos: int = 0
    token: int = 0
    # block indices mapped to SHARED (prefix-cache-pinned) pages: read-only
    # for this slot — a write there copy-on-writes to a fresh owned page
    shared: set = dataclasses.field(default_factory=set)


class PagedDecoder:
    """Multi-slot decode over a shared page pool (the serving-capacity
    building block; serve.Server composes the dense path — this class is
    the paged equivalent of its cache+decode core).

    * ``n_pages`` bounds TOTAL context across slots: n_pages * page_rows
      rows, vs the dense layout's batch * seq_len. Admission fails
      gracefully (returns False) when the pool is exhausted.
    * admission prefills the prompt through the normal batched prefill on
      a scratch dense buffer, then moves the rows page-by-page into the
      pool (device copies; the scratch is one slot deep).
    * every decode tick runs ONE jitted paged step for all slots; the page
      table is rebuilt host-side only when an allocation changes it.
    """

    def __init__(self, cfg: ModelConfig, weights, n_pages: int,
                 page_rows: int = 512, kv_dtype=jnp.bfloat16,
                 batch: int = 4, device=None, mesh=None, plan=None,
                 fused: bool = False):
        assert cfg.seq_len % page_rows == 0, "seq_len must tile into pages"
        self.cfg = cfg
        # ``device``: pin this decoder's pool/compute to one device — the
        # dp-sharded server runs one INDEPENDENT decoder per dp shard
        # (decode is batch-local; per-shard pools need no collectives)
        self.device = device
        if device is not None:
            weights = jax.device_put(weights, device)
        # ``mesh``/``plan``: run the pool AND compute tp/ep-SHARDED —
        # weights must arrive already sharded (+``fused`` when
        # fuse_weights_sharded applied); the pool shards over KVH like the
        # dense cache, the page table is replicated, and the decode step
        # runs under shard_map (host sampling only: logits gather to host)
        assert mesh is None or device is None
        self.mesh, self.plan, self._fused = mesh, plan, fused
        if mesh is not None:
            assert (plan is not None and plan.dp is None
                    and plan.sp is None and plan.pp is None), \
                "paged+mesh supports tp/ep plans"
        self.weights = weights
        self.page_rows = page_rows
        self.n_blocks = cfg.seq_len // page_rows
        self.batch = batch
        self.kv_dtype = kv_dtype
        # +1: the last page is a dedicated PARKING page, never handed out by
        # _alloc. The paged decode step writes every slot's KV row each tick
        # (and the sink rotation rewrites page pt[b, 0]) whether or not the
        # slot is active — an empty slot's pt row must therefore point at a
        # page no request owns, or its garbage rows corrupt whichever
        # request _alloc gave page 0 to.
        self.parking = n_pages
        self.pool = create_pool(cfg, n_pages + 1, page_rows, kv_dtype)
        if device is not None:
            self.pool = jax.device_put(self.pool, device)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from calm_tpu.parallel.sharding import (_tree_shardings,
                                                    cache_pspecs,
                                                    sharded_prefill,
                                                    shard_map,
                                                    weight_pspecs)
            self._pool_spec = P(None, None, plan.tp, None, None)
            self.pool = jax.device_put(
                self.pool, NamedSharding(mesh, self._pool_spec))
            wspecs = weight_pspecs(cfg, plan, fused=fused)
            rep = P()

            def build_step(rolling: bool):
                fn = shard_map(
                    partial(paged_decode_step_fn, cfg, rolling=rolling,
                            plan=plan),
                    mesh=mesh,
                    in_specs=(wspecs, rep, rep, self._pool_spec, rep),
                    out_specs=(P(None, plan.tp), self._pool_spec),
                    check_vma=False)
                return jax.jit(fn, donate_argnums=(3,))

            self._mesh_step = {r: build_step(r) for r in (False, True)}
            self._mesh_prefill = sharded_prefill(cfg, mesh, plan,
                                                 logits_mode="none",
                                                 fused=fused)
            self._scratch_shardings = _tree_shardings(mesh,
                                                      cache_pspecs(plan))
        self.free_pages = list(range(n_pages - 1, -1, -1))
        # prefix sharing: refs[p] = number of users (slots mapping page p as
        # shared + prefix-cache entries holding it). Pages with refs > 0
        # never sit in free_pages; a page frees when its last user lets go.
        self.page_refs = np.zeros(n_pages, np.int32)
        self.slots = [_PagedSlot() for _ in range(batch)]
        # dead entries point at the slot's own page 0 (reads there are
        # masked; writes never land past the slot's allocated blocks), or at
        # the parking page when the slot holds nothing
        self.pt = np.full((batch, self.n_blocks), self.parking, np.int32)

    # -- page bookkeeping ---------------------------------------------------

    def _alloc(self, n: int):
        if len(self.free_pages) < n:
            return None
        return [self.free_pages.pop() for _ in range(n)]

    def _sync_pt_row(self, b: int):
        slot = self.slots[b]
        first = slot.pages[0] if slot.pages else self.parking
        for j in range(self.n_blocks):
            self.pt[b, j] = (slot.pages[j] if j < len(slot.pages) else first)

    def pages_in_use(self) -> int:
        return sum(len(s.pages) for s in self.slots)

    # -- admission ----------------------------------------------------------

    def admit(self, b: int, tokens: list[int], shared_pages=(),
              hit_rows: int = 0) -> bool:
        """Prefill ``tokens[:-1]`` into slot b's pages; the last token
        becomes the first decode input. Pages are allocated LAZILY — the
        slot takes ceil((len+1)/PR) pages now and grows one page at a time
        as decode crosses block boundaries (bounded by ceil(seq_len/PR):
        the rolling window reuses existing pages past that). False when
        the pool cannot cover the admission itself.

        ``shared_pages``/``hit_rows``: prefix-cache hit — the first
        hit_rows (a page multiple) prompt rows already live in those
        PINNED pool pages; the slot maps them read-only (zero row copies
        for the decode working set) and prefills only the suffix. The
        suffix prefill scratch is seeded from the shared pages so its
        attention sees the prefix."""
        slot = self.slots[b]
        assert not slot.active
        assert hit_rows % self.page_rows == 0
        n_pre = min(len(tokens) - 1, self.cfg.seq_len - 1)
        if hit_rows > n_pre:  # over-long stored prefix: use the page-
            hit_rows = n_pre // self.page_rows * self.page_rows  # aligned part
            shared_pages = shared_pages[:hit_rows // self.page_rows]
        sblocks = hit_rows // self.page_rows
        need = max(1, -(-(n_pre + 1) // self.page_rows)) - sblocks
        pages = self._alloc(max(need, 0))
        if pages is None:
            return False
        slot.pages = list(shared_pages[:sblocks]) + pages
        slot.shared = set(range(sblocks))
        for p in shared_pages[:sblocks]:
            self.page_refs[p] += 1
        slot.active = True
        slot.token = tokens[-1]
        slot.pos = n_pre
        self._sync_pt_row(b)

        if n_pre > hit_rows:
            scratch = M.KVCache.create(self.cfg, 1, self.kv_dtype)
            if self.device is not None:
                scratch = jax.device_put(scratch, self.device)
            elif self.mesh is not None:
                scratch = jax.device_put(scratch, self._scratch_shardings)
            kd, vd = scratch.k, scratch.v
            for blk in range(sblocks):  # seed the shared prefix rows
                kd = _copy_page_to_rows(kd, self.pool.k, blk,
                                        slot.pages[blk], self.page_rows)
                vd = _copy_page_to_rows(vd, self.pool.v, blk,
                                        slot.pages[blk], self.page_rows)
            scratch = M.KVCache(kd, vd)
            toks = jnp.asarray([tokens[hit_rows:n_pre]], jnp.int32)
            p0 = jnp.full((1,), hit_rows, jnp.int32)
            if self.mesh is not None:
                _, scratch = self._mesh_prefill(self.weights, toks, p0,
                                                scratch)
            else:
                _, scratch = M.prefill(self.cfg, self.weights, toks, p0,
                                       scratch, logits_mode="none")
            kpool, vpool = self.pool.k, self.pool.v
            for blk in range(sblocks, -(-n_pre // self.page_rows)):
                kpool = _copy_rows_to_page(kpool, scratch.k, blk,
                                           slot.pages[blk], self.page_rows)
                vpool = _copy_rows_to_page(vpool, scratch.v, blk,
                                           slot.pages[blk], self.page_rows)
            self.pool = M.KVCache(kpool, vpool)
        return True

    def pin_prompt(self, b: int, n_rows: int):
        """Pin the pages fully covering the first ``n_rows`` prompt rows as
        a shareable prefix (zero-copy save: the pages stay where they are;
        the slot keeps them mapped read-only — its own later writes CoW).
        Returns (rows_pinned, page list) — rows_pinned is n_rows truncated
        to a page multiple; empty when nothing page-aligned to pin."""
        slot = self.slots[b]
        full = n_rows // self.page_rows
        full = min(full, len(slot.pages))
        if full == 0:
            return 0, []
        pages = slot.pages[:full]
        for j, p in enumerate(pages):
            self.page_refs[p] += 1          # the cache entry's reference
            if j not in slot.shared:
                self.page_refs[p] += 1      # the slot's mapping becomes shared
                slot.shared.add(j)
        return full * self.page_rows, pages

    def unpin_pages(self, pages):
        """Drop a prefix-cache entry's reference (eviction callback)."""
        for p in pages:
            self.page_refs[p] -= 1
            if self.page_refs[p] == 0:
                self.free_pages.append(p)

    def _cow(self, b: int, blk: int) -> bool:
        """The slot is about to WRITE a shared block: give it a private
        copy of the page first. False when the pool is dry."""
        slot = self.slots[b]
        got = self._alloc(1)
        if got is None:
            return False
        src, dst = slot.pages[blk], got[0]
        self.pool = M.KVCache(_copy_page_to_page(self.pool.k, src, dst),
                              _copy_page_to_page(self.pool.v, src, dst))
        slot.pages[blk] = dst
        slot.shared.discard(blk)
        self.page_refs[src] -= 1
        if self.page_refs[src] == 0:
            self.free_pages.append(src)
        self._sync_pt_row(b)
        return True

    def release(self, b: int):
        slot = self.slots[b]
        for j, p in enumerate(slot.pages):
            if j in slot.shared:
                self.page_refs[p] -= 1      # shared: drop our mapping only
                if self.page_refs[p] == 0:
                    self.free_pages.append(p)
            else:
                self.free_pages.append(p)
        slot.pages = []
        slot.shared = set()
        slot.active = False
        self._sync_pt_row(b)

    # -- decode -------------------------------------------------------------

    def _write_row(self, pos: int) -> int:
        """Logical cache row this step writes (model.decode_indices)."""
        S = self.cfg.seq_len
        if pos < S:
            return pos
        sink = M.KV_SINKS
        return sink + (pos - sink) % (S - sink)

    def ensure_capacity(self, b: int) -> bool:
        """Grow slot b's pages to cover its next write row, and
        copy-on-write any SHARED page this step will write (the write row's
        block; once the slot wraps, also block 0 — the sink rotation
        rewrites it). False when the pool is dry — the caller decides the
        pressure policy (the server finishes the request early and flags
        it; see serve.Server)."""
        s = self.slots[b]
        if not s.active:
            return True
        blk = self._write_row(s.pos) // self.page_rows
        while len(s.pages) <= blk:  # grow across a block boundary
            got = self._alloc(1)
            if got is None:
                return False
            s.pages.extend(got)
            self._sync_pt_row(b)
        if blk in s.shared and not self._cow(b, blk):
            return False
        if s.pos + 1 >= self.cfg.seq_len and 0 in s.shared \
                and not self._cow(b, 0):
            return False
        return True

    def step(self, host: bool = True):
        """One decode step for every slot; returns logits (B, V) — on host
        as f32 when ``host`` (the default), else the device array (the
        server's device-sampling path feeds it straight to
        sampler.device_sample so only the sampled (B,) ints ever transfer).
        Inactive slots decode garbage at their parked position (their pt
        row points at the parking page, so the unconditional KV write and
        sink rotation never touch a live request's pages).
        Raises RuntimeError when an active slot needs a page and the pool
        is dry (call ensure_capacity first to apply a gentler policy)."""
        for b in range(self.batch):
            if not self.ensure_capacity(b):
                raise RuntimeError("page pool exhausted mid-decode")
        tokens = jnp.asarray([s.token for s in self.slots], jnp.int32)
        pos = jnp.asarray([s.pos for s in self.slots], jnp.int32)
        rolling = bool(any(s.pos + 1 >= self.cfg.seq_len for s in self.slots
                           if s.active))
        if self.mesh is not None:
            logits, self.pool = self._mesh_step[rolling](
                self.weights, tokens, pos, self.pool, jnp.asarray(self.pt))
        else:
            logits, self.pool = paged_decode_step(
                self.cfg, self.weights, tokens, pos, self.pool,
                jnp.asarray(self.pt), rolling=rolling)
        for s in self.slots:
            if s.active:
                s.pos += 1
        return np.asarray(logits, np.float32) if host else logits

    def set_token(self, b: int, tok: int):
        self.slots[b].token = tok

    def step_sampled(self, key, temps, minps) -> np.ndarray:
        """One decode step + on-device min-p sampling: only the (B,) token
        ids transfer to the host (sampling runs on this decoder's own
        device — the dp-sharded server never funnels logits anywhere)."""
        from calm_tpu.sampler import device_sample
        logits = self.step(host=False)
        return np.asarray(device_sample(logits, key, jnp.asarray(temps),
                                        jnp.asarray(minps)))


class PagedGroup:
    """dp-sharded paging: one INDEPENDENT PagedDecoder (pool + compute) per
    dp shard, each pinned to that shard's device.

    Decode is batch-local — dp introduces no collectives — so per-shard
    pools need no SPMD lockstep at all: each shard's step dispatches
    asynchronously on its own device and the host only fences when reading
    results. Multihost: each process constructs decoders ONLY for its own
    dp shards (its local devices) and serves its own slot range; the dp
    axis rides the process boundary (DCN), exactly where
    make_multihost_mesh places it. Slots partition contiguously: local
    slot ``b`` (global id) maps to decoder (b - own_lo) // per_shard.

    Presents the PagedDecoder surface for the server's tick; ``step`` /
    ``step_sampled`` return only the LOCAL slots' rows."""

    def __init__(self, cfg: ModelConfig, weights, pool_pages: int,
                 page_rows: int, kv_dtype, per_shard: int, devices,
                 own_lo: int = 0):
        self.page_rows = page_rows
        self.per = per_shard
        self.own_lo = own_lo
        self.decs = [PagedDecoder(cfg, weights, pool_pages, page_rows,
                                  kv_dtype, per_shard, device=d)
                     for d in devices]

    def _loc(self, b: int):
        d, r = divmod(b - self.own_lo, self.per)
        return self.decs[d], r

    def set_token(self, b: int, tok: int):
        dec, lb = self._loc(b)
        dec.slots[lb].token = tok

    def admit(self, b, tokens, shared_pages=(), hit_rows: int = 0) -> bool:
        dec, lb = self._loc(b)
        return dec.admit(lb, tokens, shared_pages, hit_rows)

    def release(self, b: int):
        dec, lb = self._loc(b)
        dec.release(lb)

    def ensure_capacity(self, b: int) -> bool:
        dec, lb = self._loc(b)
        return dec.ensure_capacity(lb)

    def pin_prompt(self, b: int, n_rows: int):
        dec, lb = self._loc(b)
        return dec.pin_prompt(lb, n_rows)

    def shard_of(self, b: int) -> int:
        """Which decoder serves global slot b (prefix caches are
        per-decoder: pinned page ids only mean something in the pool that
        owns them)."""
        return (b - self.own_lo) // self.per

    def pages_in_use(self) -> int:
        return sum(d.pages_in_use() for d in self.decs)

    def step(self, host: bool = True) -> np.ndarray:
        # dispatch every shard before fencing any: the per-device programs
        # run concurrently under jax's async dispatch
        outs = [d.step(host=False) for d in self.decs]
        return np.concatenate([np.asarray(o).astype(np.float32)
                               for o in outs], axis=0)

    def step_sampled(self, key, temps, minps) -> np.ndarray:
        from calm_tpu.sampler import device_sample
        keys = jax.random.split(key, len(self.decs))
        devs = []
        for i, d in enumerate(self.decs):
            sl = slice(i * self.per, (i + 1) * self.per)
            lg = d.step(host=False)
            devs.append(device_sample(lg, keys[i], jnp.asarray(temps[sl]),
                                      jnp.asarray(minps[sl])))
        return np.concatenate([np.asarray(x) for x in devs], axis=0)
