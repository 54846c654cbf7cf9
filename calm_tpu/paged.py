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
                         rolling: bool = True):
    """One token per slot on a PAGED cache: token/pos (B,), cache the
    (L, P, KVH, PR, hd) pool, pt (B, seq_len//PR) int32 page table ->
    (logits (B, V), cache)."""
    kv_pos, kv_len = M.decode_indices(cfg, pos)
    return M._forward(cfg, w, token[:, None], pos[:, None], kv_pos[:, None],
                      kv_len, cache, rolling=rolling, logits_mode="last",
                      pt=pt)


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
                 batch: int = 4):
        assert cfg.seq_len % page_rows == 0, "seq_len must tile into pages"
        self.cfg = cfg
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
        self.free_pages = list(range(n_pages - 1, -1, -1))
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

    def admit(self, b: int, tokens: list[int]) -> bool:
        """Prefill ``tokens[:-1]`` into slot b's pages; the last token
        becomes the first decode input. Pages are allocated LAZILY — the
        slot takes ceil((len+1)/PR) pages now and grows one page at a time
        as decode crosses block boundaries (bounded by ceil(seq_len/PR):
        the rolling window reuses existing pages past that). False when
        the pool cannot cover the admission itself."""
        slot = self.slots[b]
        assert not slot.active
        n_pre = min(len(tokens) - 1, self.cfg.seq_len - 1)
        need = max(1, -(-(n_pre + 1) // self.page_rows))
        pages = self._alloc(need)
        if pages is None:
            return False
        slot.pages = pages
        slot.active = True
        slot.token = tokens[-1]
        slot.pos = n_pre
        self._sync_pt_row(b)

        if n_pre:
            scratch = M.KVCache.create(self.cfg, 1, self.kv_dtype)
            _, scratch = M.prefill(
                self.cfg, self.weights,
                jnp.asarray([tokens[:n_pre]], jnp.int32),
                jnp.zeros((1,), jnp.int32), scratch, logits_mode="none")
            kpool, vpool = self.pool.k, self.pool.v
            for blk in range(-(-n_pre // self.page_rows)):
                kpool = _copy_rows_to_page(kpool, scratch.k, blk,
                                           pages[blk], self.page_rows)
                vpool = _copy_rows_to_page(vpool, scratch.v, blk,
                                           pages[blk], self.page_rows)
            self.pool = M.KVCache(kpool, vpool)
        return True

    def release(self, b: int):
        slot = self.slots[b]
        self.free_pages.extend(slot.pages)
        slot.pages = []
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
        """Grow slot b's pages to cover its next write row. False when the
        pool is dry — the caller decides the pressure policy (the server
        finishes the request early and flags it; see serve.Server)."""
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
        logits, self.pool = paged_decode_step(
            self.cfg, self.weights, tokens, pos, self.pool,
            jnp.asarray(self.pt), rolling=rolling)
        for s in self.slots:
            if s.active:
                s.pos += 1
        return np.asarray(logits, np.float32) if host else logits
