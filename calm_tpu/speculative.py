"""Greedy speculative decoding with a draft model.

New scope beyond the reference (which is strictly one forward per token):
a small draft model proposes GAMMA tokens with its own on-device decode
scan, the target model scores all of them in ONE batched forward (the same
MXU-friendly prefill path that makes prompt processing fast), and the
longest draft prefix matching the target's argmaxes is accepted — plus one
free token from the target's own logits at the first mismatch. Output is
BIT-IDENTICAL to plain greedy decoding of the target (the acceptance rule
only ever emits target argmaxes); the draft only changes the SPEED.

Per round: 1 draft scan + 1 target verify = 2 device programs for up to
GAMMA+1 tokens, vs GAMMA+1 programs for plain stepping. Token throughput
multiplies by the acceptance rate; with a well-matched draft (e.g. a 1B
alongside a 7-34B) typical acceptance is 60-85%.

Cache bookkeeping needs no rewind: rejected draft/target rows sit at
positions the next round re-writes, and the kv_len mask hides every row
until its position is reached (same invariant as the engine's chunked
greedy scan).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from calm_tpu import model as M
from calm_tpu.engine import Engine, GenStats, kv_cache_bytes
from calm_tpu.sampler import XorshiftRng


def _minp_probs(logits: np.ndarray, temperature: float, minp: float) -> np.ndarray:
    """The engine's sampling distribution as an explicit prob vector:
    min-p cutoff in logit space, temperature softmax over survivors
    (matches Sampler._sample_minp, reference src/sampler.c:44-78)."""
    m = float(logits.max())
    cutoff = m + np.log(minp) * temperature
    p = np.where(logits >= cutoff,
                 np.exp((logits - m) / temperature, dtype=np.float32), 0.0)
    return p / p.sum(dtype=np.float32)


def speculative_generate(target: Engine, draft: Engine, prompt: str = "",
                         steps: int = 256, *, gamma: int = 4,
                         temperature: float = 0.0, minp: float = 0.1,
                         seed: int = 42, pos_offset: int = 0,
                         echo: bool = False, on_piece=None) -> GenStats:
    """Decode the target, accelerated by the draft. temperature == 0 uses the
    greedy longest-matching-prefix rule (output bit-identical to plain
    greedy); temperature > 0 uses speculative REJECTION sampling: draft
    token x_i is accepted with probability min(1, p_t(x_i)/q_d(x_i)) and a
    rejection resamples from max(p_t - q_d, 0) — the emitted sequence is
    distributed exactly as sampling the target alone. Mirrors
    Engine.generate's loop contract (stop tokens, perf accounting, hash)."""
    if temperature > 0.0:
        return _speculative_sampled(target, draft, prompt, steps, gamma=gamma,
                                    temperature=temperature, minp=minp,
                                    seed=seed, pos_offset=pos_offset,
                                    echo=echo, on_piece=on_piece)
    tok = target.tokenizer
    prompt_tokens = tok.encode(prompt, bos=True)
    if not prompt_tokens:
        prompt_tokens = [tok.bos_id if tok.bos_id >= 0 else 0]
    stops = (tok.bos_id, tok.eos_id, tok.eot_id)

    out = bytearray()

    def emit(piece: bytes):
        out.extend(piece)
        if on_piece:
            on_piece(piece.decode("utf-8", errors="replace"))

    if echo and prompt_tokens[0] != tok.bos_id:
        emit(tok.decode_piece(tok.bos_id, prompt_tokens[0]))

    read_bytes = 0
    start = time.perf_counter()

    n_prompt = len(prompt_tokens)
    pos = 0
    if n_prompt > 1:
        target.prefill_tokens(prompt_tokens[:-1], pos_offset)
        draft.prefill_tokens(prompt_tokens[:-1], pos_offset)
        read_bytes += (n_prompt - 1) * (target.n_bandwidth + draft.n_bandwidth)
        if echo:
            for p in range(n_prompt - 1):
                emit(tok.decode_piece(prompt_tokens[p], prompt_tokens[p + 1]))
        pos = n_prompt - 1

    token = prompt_tokens[-1]
    logits_last = None
    n_rounds = 0
    n_accepted = 0
    n_emitted = 0
    stopped = False
    all_ids: list[int] = []

    # speculation must stay inside the un-rolled window of both models
    horizon = min(target.cfg.seq_len, draft.cfg.seq_len)

    while not stopped and (pos < steps or steps < 0):
        budget = gamma if steps < 0 else max(1, min(gamma, steps - pos))
        if pos + pos_offset + budget + 1 >= horizon:
            # near the window edge: fall back to plain target stepping
            logits = target.step(token, pos + pos_offset)
            draft.step(token, pos + pos_offset)
            read_bytes += target.n_bandwidth + draft.n_bandwidth
            logits_last = logits
            nxt = int(np.argmax(logits))
            pos += 1
            all_ids.append(nxt)
            if nxt in stops:
                break
            emit(tok.decode_piece(token, nxt))
            token = nxt
            continue

        # 1) draft proposes `budget` tokens (one device program)
        d_toks, draft.cache, _ = M.decode_scan(
            draft.cfg, draft.weights, jnp.array([token], jnp.int32),
            jnp.array([pos + pos_offset], jnp.int32), draft.cache, budget,
            rolling=False)  # the window-edge guard above keeps us below S
        proposal = [int(t) for t in np.asarray(d_toks[0])]
        read_bytes += budget * draft.n_bandwidth

        # 2) target scores [token, proposal[:-1]] in one batched forward;
        #    logits[i] is the target's next-token distribution after
        #    position pos+i, i.e. its verdict on proposal[i]
        verify = [token] + proposal[:-1]
        t_logits, target.cache = M.prefill(
            target.cfg, target.weights, jnp.asarray([verify], jnp.int32),
            jnp.array([pos + pos_offset], jnp.int32), target.cache,
            logits_mode="all")
        t_logits = np.asarray(t_logits[0], np.float32)  # (budget, V)
        read_bytes += target.n_bandwidth + kv_cache_bytes(
            target.cfg, target.kv_bits, pos + pos_offset + budget)

        # 3) accept the longest matching prefix; target's argmax replaces
        #    the first mismatch (greedy-exact: everything emitted IS the
        #    target's argmax chain)
        n_rounds += 1
        emitted = []
        for i in range(budget):
            t_arg = int(np.argmax(t_logits[i]))
            emitted.append(t_arg)
            logits_last = t_logits[i]
            if t_arg != proposal[i]:
                break
            n_accepted += 1

        for nxt in emitted:
            pos += 1
            n_emitted += 1
            all_ids.append(nxt)
            if nxt in stops:
                stopped = True
                break
            emit(tok.decode_piece(token, nxt))
            token = nxt

        # re-sync the draft past target-corrected tokens: the draft cache
        # holds rows for ITS proposal; rows diverge from the accepted chain
        # only at the mismatch position, which the next round's draft scan
        # re-writes (it starts from the corrected `token` at the new pos)

    seconds = time.perf_counter() - start
    h = M.logits_hash(logits_last) if logits_last is not None else 0
    stats = GenStats(tokens=pos, seconds=seconds, read_bytes=read_bytes,
                     logits_hash=h, text=out.decode("utf-8", errors="replace"))
    stats.acceptance = (n_accepted / max(n_emitted, 1))
    stats.rounds = n_rounds
    stats.ids = all_ids
    return stats


def _speculative_sampled(target: Engine, draft: Engine, prompt: str,
                         steps: int, *, gamma: int, temperature: float,
                         minp: float, seed: int, pos_offset: int,
                         echo: bool, on_piece) -> GenStats:
    tok = target.tokenizer
    prompt_tokens = tok.encode(prompt, bos=True)
    if not prompt_tokens:
        prompt_tokens = [tok.bos_id if tok.bos_id >= 0 else 0]
    stops = (tok.bos_id, tok.eos_id, tok.eot_id)
    rng = XorshiftRng(seed)
    key = jax.random.PRNGKey(seed)
    temps = jnp.full((1,), temperature, jnp.float32)
    minps = jnp.full((1,), minp, jnp.float32)

    out = bytearray()

    def emit(piece: bytes):
        out.extend(piece)
        if on_piece:
            on_piece(piece.decode("utf-8", errors="replace"))

    if echo and prompt_tokens[0] != tok.bos_id:
        emit(tok.decode_piece(tok.bos_id, prompt_tokens[0]))

    read_bytes = 0
    start = time.perf_counter()

    n_prompt = len(prompt_tokens)
    pos = 0
    if n_prompt > 1:
        target.prefill_tokens(prompt_tokens[:-1], pos_offset)
        draft.prefill_tokens(prompt_tokens[:-1], pos_offset)
        read_bytes += (n_prompt - 1) * (target.n_bandwidth + draft.n_bandwidth)
        if echo:
            for p in range(n_prompt - 1):
                emit(tok.decode_piece(prompt_tokens[p], prompt_tokens[p + 1]))
        pos = n_prompt - 1

    token = prompt_tokens[-1]
    logits_last = None
    n_rounds = 0
    n_accepted = 0
    n_emitted = 0
    stopped = False
    all_ids: list[int] = []
    horizon = min(target.cfg.seq_len, draft.cfg.seq_len)

    while not stopped and (pos < steps or steps < 0):
        budget = gamma if steps < 0 else max(1, min(gamma, steps - pos))
        if pos + pos_offset + budget + 2 >= horizon:
            # window edge: plain target sampling step
            logits = target.step(token, pos + pos_offset)
            draft.step(token, pos + pos_offset)
            read_bytes += target.n_bandwidth + draft.n_bandwidth
            logits_last = logits
            probs = _minp_probs(logits, temperature, minp)
            r = rng.next_f32()
            nxt = int(np.searchsorted(np.cumsum(probs), r * probs.sum()))
            nxt = min(nxt, len(probs) - 1)
            pos += 1
            all_ids.append(nxt)
            if nxt in stops:
                break
            emit(tok.decode_piece(token, nxt))
            token = nxt
            continue

        # 1) draft SAMPLES `budget` tokens from its own distribution; its
        #    per-step logits come back for the q_d(x) terms
        key, sub = jax.random.split(key)
        d_toks, draft.cache, d_logits = M.decode_scan_sampled(
            draft.cfg, draft.weights, jnp.array([token], jnp.int32),
            jnp.array([pos + pos_offset], jnp.int32), draft.cache, budget,
            sub, temps, minps, rolling=False)
        proposal = [int(t) for t in np.asarray(d_toks[0])]
        d_logits = np.asarray(d_logits[:, 0], np.float32)  # (budget, V)
        read_bytes += budget * draft.n_bandwidth

        # 2) target scores [token] + proposal in one forward: logits[i] is
        #    p_t after position pos+i (i = 0..budget)
        verify = [token] + proposal
        t_logits, target.cache = M.prefill(
            target.cfg, target.weights, jnp.asarray([verify], jnp.int32),
            jnp.array([pos + pos_offset], jnp.int32), target.cache,
            logits_mode="all")
        t_logits = np.asarray(t_logits[0], np.float32)  # (budget+1, V)
        read_bytes += target.n_bandwidth + kv_cache_bytes(
            target.cfg, target.kv_bits, pos + pos_offset + budget)

        # 3) rejection-sample the longest accepted prefix
        n_rounds += 1
        p0 = pos  # round start position (for the full-accept backfill)
        full_accept = False
        emitted = []
        for i in range(budget):
            p = _minp_probs(t_logits[i], temperature, minp)
            q = _minp_probs(d_logits[i], temperature, minp)
            x = proposal[i]
            logits_last = t_logits[i]
            if q[x] > 0 and rng.next_f32() < min(1.0, float(p[x] / q[x])):
                emitted.append(x)
                n_accepted += 1
                continue
            # rejected: resample from the residual max(p - q, 0)
            resid = np.maximum(p - q, 0.0)
            s = resid.sum(dtype=np.float32)
            if s <= 0:
                resid, s = p, p.sum(dtype=np.float32)
            r = rng.next_f32() * s
            emitted.append(int(min(np.searchsorted(np.cumsum(resid), r),
                                   len(resid) - 1)))
            break
        else:
            # every draft token accepted: one bonus token from the target's
            # post-proposal distribution
            full_accept = True
            p = _minp_probs(t_logits[budget], temperature, minp)
            logits_last = t_logits[budget]
            r = rng.next_f32()
            emitted.append(int(min(np.searchsorted(np.cumsum(p), r * p.sum()),
                                   len(p) - 1)))

        if full_accept:
            # backfill the draft KV row the scan never wrote: the scan wrote
            # rows p0..p0+budget-1 for [token, proposal[:-1]]; after a full
            # accept + bonus the next round starts at p0+budget+1, so
            # proposal[-1]'s row at p0+budget would stay a hole forever —
            # the draft would attend a zero row for the rest of the window,
            # silently degrading acceptance (output stays exact: q uses the
            # draft's actual logits either way)
            draft.step(proposal[-1], p0 + pos_offset + budget)
            read_bytes += draft.n_bandwidth

        for nxt in emitted:
            pos += 1
            n_emitted += 1
            all_ids.append(nxt)
            if nxt in stops:
                stopped = True
                break
            emit(tok.decode_piece(token, nxt))
            token = nxt

    seconds = time.perf_counter() - start
    h = M.logits_hash(logits_last) if logits_last is not None else 0
    stats = GenStats(tokens=pos, seconds=seconds, read_bytes=read_bytes,
                     logits_hash=h, text=out.decode("utf-8", errors="replace"))
    stats.acceptance = (n_accepted / max(n_emitted, 1))
    stats.rounds = n_rounds
    stats.ids = all_ids
    return stats


# ---------------------------------------------------------------------------
# draft-TREE speculation: k root-branched chains verified in one forward
# ---------------------------------------------------------------------------


def _tree_mask(k: int, m: int) -> np.ndarray:
    """Ancestor-or-self reachability for the root-branched tree: node 0 is
    the root; lane i contributes nodes 1 + i*(m-1) + (0..m-2) at depths
    1..m-1. (N, N) bool, static per (k, m) — compiled into the verify."""
    n = 1 + k * (m - 1)
    t = np.zeros((n, n), bool)
    t[:, 0] = True  # everyone sees the root
    for i in range(k):
        base = 1 + i * (m - 1)
        for d in range(m - 1):
            t[base + d, base:base + d + 1] = True  # own lane, shallower+self
    return t


def tree_speculative_generate(target: Engine, draft: Engine,
                              prompt: str = "", steps: int = 256, *,
                              k: int = 3, m: int = 5,
                              pos_offset: int = 0, echo: bool = False,
                              on_piece=None) -> GenStats:
    """Greedy draft-TREE decoding: instead of one chain of gamma tokens,
    the draft proposes its TOP-K first tokens and rolls a greedy chain of
    ``m`` tokens from each — one BATCHED draft scan (lanes ride the batch
    axis; the draft cache is broadcast to k lanes once). The target then
    verifies all 1 + k*(m-1) nodes in ONE forward with a tree attention
    mask (model.tree_verify): each node attends to the context plus its
    own ancestors only, RoPE positions follow DEPTH (sibling lanes share
    positions), KV rows land flat and the winning lane's rows are
    relocated onto the contiguous accepted span (model.cache_move_rows).

    Greedy-exact: everything emitted is the target's own argmax chain —
    identical ids/hash to Engine.generate(temperature=0). The tree only
    changes SPEED: when the draft's top-1 misses but its top-k covers the
    target's pick, a linear chain dies at depth 0 while a tree keeps
    going (measured acceptance gain in tests/test_speculative.py).

    The draft Engine's own cache is left untouched after the prompt
    prefill (lanes live in a local batch-k copy).
    """
    tok = target.tokenizer
    prompt_tokens = tok.encode(prompt, bos=True)
    if not prompt_tokens:
        prompt_tokens = [tok.bos_id if tok.bos_id >= 0 else 0]
    stops = (tok.bos_id, tok.eos_id, tok.eot_id)

    out = bytearray()

    def emit(piece: bytes):
        out.extend(piece)
        if on_piece:
            on_piece(piece.decode("utf-8", errors="replace"))

    if echo and prompt_tokens[0] != tok.bos_id:
        emit(tok.decode_piece(tok.bos_id, prompt_tokens[0]))

    read_bytes = 0
    start = time.perf_counter()

    n_prompt = len(prompt_tokens)
    pos = 0
    if n_prompt > 1:
        target.prefill_tokens(prompt_tokens[:-1], pos_offset)
        draft.prefill_tokens(prompt_tokens[:-1], pos_offset)
        read_bytes += (n_prompt - 1) * (target.n_bandwidth + draft.n_bandwidth)
        if echo:
            for p in range(n_prompt - 1):
                emit(tok.decode_piece(prompt_tokens[p], prompt_tokens[p + 1]))
        pos = n_prompt - 1

    # lanes ride the draft's batch axis: one broadcast copy of the prompt's
    # KV, then every round's k chains run as ONE batched decode scan
    dcache = M.KVCache(jnp.repeat(draft.cache.k, k, axis=1),
                       jnp.repeat(draft.cache.v, k, axis=1))
    tree = jnp.asarray(_tree_mask(k, m))
    depth = jnp.asarray([0] + [d for _ in range(k) for d in range(1, m)],
                        jnp.int32)
    N = 1 + k * (m - 1)

    token = prompt_tokens[-1]
    logits_last = None
    n_rounds = 0
    n_accepted = 0
    n_emitted = 0
    stopped = False
    all_ids: list[int] = []
    horizon = min(target.cfg.seq_len, draft.cfg.seq_len)

    while not stopped and (pos < steps or steps < 0):
        room = steps - pos if steps >= 0 else m
        if pos + pos_offset + max(N, m + 1) + 1 >= horizon or room < m:
            # window edge / tail: plain target stepping (same fallback as
            # speculative_generate)
            logits = target.step(token, pos + pos_offset)
            read_bytes += target.n_bandwidth
            logits_last = logits
            nxt = int(np.argmax(logits))
            pos += 1
            all_ids.append(nxt)
            if nxt in stops:
                break
            emit(tok.decode_piece(token, nxt))
            token = nxt
            continue

        p = pos + pos_offset
        # 1) draft root step (batched over lanes, identical inputs):
        #    writes row p in every lane, logits give the top-k fan-out
        d_log, dcache = M.decode_step(
            draft.cfg, draft.weights,
            jnp.full((k,), token, jnp.int32),
            jnp.full((k,), p, jnp.int32), dcache, rolling=False)
        read_bytes += draft.n_bandwidth
        firsts = np.argsort(np.asarray(d_log[0], np.float32))[-k:][::-1]
        firsts = firsts.astype(np.int64)

        # 2) k greedy chains, one batched scan: lane i rolls from firsts[i]
        d_toks, dcache, _ = M.decode_scan(
            draft.cfg, draft.weights, jnp.asarray(firsts, jnp.int32),
            jnp.full((k,), p + 1, jnp.int32), dcache, m - 1, rolling=False)
        chains = np.concatenate([firsts[:, None], np.asarray(d_toks)],
                                axis=1)  # (k, m)
        read_bytes += (m - 1) * draft.n_bandwidth

        # 3) one tree-masked target forward over all nodes
        flat = [token] + [int(t) for i in range(k)
                          for t in chains[i, :m - 1]]
        t_logits, target.cache = M.tree_verify(
            target.cfg, target.weights, jnp.asarray([flat], jnp.int32),
            jnp.asarray([p], jnp.int32), depth, tree, target.cache)
        t_logits = np.asarray(t_logits[0], np.float32)  # (N, V)
        read_bytes += target.n_bandwidth + kv_cache_bytes(
            target.cfg, target.kv_bits, p + N)

        # 4) walk the tree along target argmaxes (greedy-exact)
        n_rounds += 1
        emitted = []
        a = int(np.argmax(t_logits[0]))
        logits_last = t_logits[0]
        emitted.append(a)
        lane = next((i for i in range(k) if int(chains[i, 0]) == a), None)
        if lane is not None:
            n_accepted += 1
            for d in range(1, m):
                node = 1 + lane * (m - 1) + (d - 1)
                a = int(np.argmax(t_logits[node]))
                logits_last = t_logits[node]
                emitted.append(a)
                if a != int(chains[lane, d]):
                    break
                n_accepted += 1
        # 5) relocate the winning lane's rows onto the contiguous span and
        #    share its chain history across draft lanes (next round's scan
        #    must see the accepted context in every lane)
        #
        # INVARIANT (overwrite-before-read): all m-1 lane rows move, even
        # past the accepted span — the stale tail rows are safe only
        # because every later round REWRITES rows >= the new position
        # before anything attends to them (each round writes its full
        # k*(m-1) tree block at the current frontier, and N >= m). A change
        # that lets a round attend beyond its own frontier (variable tree
        # shapes, skipping the verify) must mask or zero the moved tail.
        lane_i = 0 if lane is None else lane
        target.cache = M.cache_move_rows(
            target.cache, jnp.int32(p + 1 + lane_i * (m - 1)),
            jnp.int32(p + 1), m - 1)
        dcache = M.cache_bcast_rows(dcache, jnp.int32(lane_i),
                                    jnp.int32(p + 1), m - 1)

        for nxt in emitted:
            pos += 1
            n_emitted += 1
            all_ids.append(nxt)
            if nxt in stops:
                stopped = True
                break
            emit(tok.decode_piece(token, nxt))
            token = nxt

    seconds = time.perf_counter() - start
    h = M.logits_hash(logits_last) if logits_last is not None else 0
    stats = GenStats(tokens=pos, seconds=seconds, read_bytes=read_bytes,
                     logits_hash=h, text=out.decode("utf-8", errors="replace"))
    stats.acceptance = (n_accepted / max(n_emitted, 1))
    stats.rounds = n_rounds
    stats.ids = all_ids
    return stats
