"""Generation engine: model assembly, decode loop, chat, perplexity.

This is the TPU-native counterpart of the reference driver (src/run.c):

- model assembly from one .calm container (config, weights, tokenizer,
  sampler) with the same bandwidth/params accounting (src/run.c:131-152,
  523-532) feeding the per-sequence perf line (src/run.c:249-253)
- decode loop with prompt prefill (batched — the reference processes prompts
  serially, README.md:80), greedy/min-p sampling, bos/eos/eot stop rules
- perplexity harness with running mean ± standard error (src/run.c:258-316)
- chat mode with vocab-sniffed prompt templates (src/run.c:318-347)
- fp8 KV-cache auto-selection for contexts > 4096 (src/run.c:536-540)
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
import weakref
from typing import Callable

import jax.numpy as jnp
import numpy as np

from calm_tpu import model as M
from calm_tpu.config import ModelConfig
from calm_tpu.container import TensorFile
from calm_tpu.sampler import Sampler, softmax_prob
from calm_tpu.tokenizer import Tokenizer


@dataclasses.dataclass
class GenStats:
    tokens: int
    seconds: float
    read_bytes: int
    logits_hash: int
    text: str

    @property
    def tok_s(self) -> float:
        return self.tokens / self.seconds if self.seconds else 0.0

    @property
    def gb_s(self) -> float:
        return self.read_bytes / 1e9 / self.seconds if self.seconds else 0.0

    def perf_line(self) -> str:
        ms = self.seconds * 1000 / max(self.tokens, 1)
        return (f"# {self.tokens} tokens: throughput: {self.tok_s:.2f} tok/s; "
                f"latency: {ms:.2f} ms/tok; bandwidth: {self.gb_s:.2f} GB/s; "
                f"total {self.seconds:.3f} sec; #{self.logits_hash:08x}")


def kv_cache_bytes(cfg: ModelConfig, kv_bits: int, pos: int) -> int:
    """KV bytes read for one token at a given position (src/run.c:161-165)."""
    kv_len = cfg.seq_len if pos >= cfg.seq_len else pos + 1
    return 2 * (kv_bits // 8) * cfg.n_layers * cfg.kv_dim * kv_len


# process-level weight cache: engines opening the same container share one
# device copy (speculative decoding with target==draft, server + offline
# engine in one process). Weight pytrees are immutable post-load, so sharing
# is safe; weak values let the copy die with its last engine.
_WEIGHTS_CACHE: "weakref.WeakValueDictionary[tuple, M.Weights]" = (
    weakref.WeakValueDictionary())


class Engine:
    def __init__(self, path: str, context: int = 0,
                 kv_dtype: str | None = None, batch: int = 1,
                 precise: bool = False, lazy_weights: bool = False):
        """``lazy_weights=True`` skips host-replicated weight loading — the
        caller installs ``self.weights`` itself (the sharded server uses
        parallel.sharding.load_weights_sharded so each host reads only its
        shard of the container)."""
        import jax
        from calm_tpu.ops import qmm as _qmm
        _qmm.enable_pallas(jax.default_backend() == "tpu")
        # set unconditionally: a later Engine(precise=False) in the same
        # process must turn the sticky module flag back off
        _qmm.enable_precise(precise)

        self.tf = TensorFile(path)
        self.cfg = ModelConfig.from_metadata(self.tf.metadata, context)
        self.tokenizer = Tokenizer.from_container(self.tf)

        if kv_dtype is None:
            kv_dtype = "fp8" if self.cfg.seq_len > 4096 else "bf16"
        if kv_dtype == "fp16" and jax.default_backend() == "tpu":
            # Mosaic has no f16: the TPU fast path stores KV in bf16 (same
            # width; the CPU oracle keeps true fp16 for reference parity)
            kv_dtype = "bf16"
        self.kv_dtype = kv_dtype
        self._kv_jnp = {"fp8": jnp.float8_e5m2, "bf16": jnp.bfloat16,
                        "fp16": jnp.float16}[kv_dtype]
        self.kv_bits = 8 if kv_dtype == "fp8" else 16

        if lazy_weights:
            self.weights = None
        else:
            # fused gf4 layouts REPLACE the naturals (zero HBM duplication,
            # model.fuse_gf4_weights) — the fused pytree is context/batch-
            # independent, so engines sharing a container share one copy
            st = os.stat(path)
            wkey = (os.path.realpath(path), st.st_mtime_ns, st.st_size)
            w = _WEIGHTS_CACHE.get(wkey)
            if w is None:
                # host-side fusion: permutations run in numpy over the
                # memmap, so the chip never pays the one-weight-stack
                # massage transient (OOM at Mixtral-geometry gf4 sizes)
                w = M.load_weights_fused(self.tf, self.cfg)
                _WEIGHTS_CACHE[wkey] = w
            self.weights = w
        self.batch = batch

        # weight bytes/params accounting (src/run.c:523-532)
        self.n_bytes, self.n_params = self.tf.count_bytes("model.")
        embed_bytes, _ = self.tf.count_bytes("model.embed.")
        self.n_bandwidth = self.n_bytes - embed_bytes
        if self.tf.find("model.output.weight") is None:
            self.n_bandwidth += self.tf.nbytes("model.embed.weight")
        if self.cfg.n_experts:
            mlp_bytes, _ = self.tf.count_bytes("model.layers.", ".mlp.w")
            self.n_bandwidth -= mlp_bytes
            self.n_bandwidth += mlp_bytes // self.cfg.n_experts * self.cfg.n_experts_ac

        self.cache = M.KVCache.create(self.cfg, batch, self._kv_jnp)

    # -- info ---------------------------------------------------------------

    def banner(self) -> str:
        c = self.cfg
        kv_gib = kv_cache_bytes(c, self.kv_bits, c.seq_len - 1) / 2**30
        return (f"# {self.tf.path}: {self.n_params / 1e9:.1f}B params "
                f"({self.n_bytes / 2**30:.1f} GiB @ {self.n_bytes * 8 / self.n_params:.2f} bpw), "
                f"{c.seq_len} context (kvcache {kv_gib:.1f} GiB @ {self.kv_dtype})")

    def reset(self):
        self.cache = M.KVCache.create(self.cfg, self.batch, self._kv_jnp)

    # -- low-level steps ------------------------------------------------------

    # prefill activations are (T, D) f32 + (T, V) logits: cap chunks so a
    # 128k-context ingest doesn't blow HBM on activations (the flash-prefill
    # kernel itself is blockwise and memory-flat in T)
    PREFILL_CHUNK = 8192

    def prefill_tokens(self, tokens: list[int], pos0: int = 0) -> np.ndarray:
        """Feed prompt tokens; returns logits after the last one. Splits into
        bounded chunks; tokens beyond the window fall back to stepping."""
        cfg = self.cfg
        logits = None
        i = 0
        while i < len(tokens):
            if pos0 + i >= cfg.seq_len:
                # beyond the window: rolling decode steps (updates KV + logits)
                logits = self.step(tokens[i], pos0 + i)
                i += 1
                continue
            n = min(self.PREFILL_CHUNK, cfg.seq_len - (pos0 + i))
            chunk = tokens[i : i + n]
            out, self.cache = M.prefill(
                cfg, self.weights, jnp.asarray([chunk], jnp.int32),
                jnp.array([pos0 + i], jnp.int32), self.cache, logits_mode="last")
            logits = np.asarray(out[0], np.float32)
            i += len(chunk)
        return logits

    def step(self, token: int, pos: int) -> np.ndarray:
        """One decode step; returns f32 logits on host."""
        out, self.cache = M.decode_step(
            self.cfg, self.weights, jnp.array([token], jnp.int32),
            jnp.array([pos], jnp.int32), self.cache,
            rolling=pos + 1 >= self.cfg.seq_len)
        return np.asarray(out[0], np.float32)

    # -- modes ---------------------------------------------------------------

    def generate(self, prompt: str = "", steps: int = 256, *,
                 temperature: float = 1.0, minp: float = 0.1, seed: int = 42,
                 pos_offset: int = 0, echo: bool = False,
                 reference_sampling: bool = False,
                 on_piece: Callable[[str], None] | None = None) -> GenStats:
        """Decode one sequence; mirrors the reference loop (src/run.c:167-256):
        prompt tokens forced, stop on bos/eos/eot, perf accounting per token.

        Sampling (temperature > 0) runs ON DEVICE by default: chunks of
        CHUNK tokens decode in one compiled program with min-p sampling
        inside the scan (calm_tpu.sampler.device_sample), matching the
        reference's one-launch-per-token contract for every mode
        (src/run.c:209). The device path draws from the JAX counter PRNG;
        ``reference_sampling=True`` restores the per-token host loop with
        the bit-compatible xorshift64* stream (src/sampler.c:7-17)."""
        tok = self.tokenizer
        sampler = Sampler(self.cfg.vocab_size, seed, temperature, minp)
        prompt_tokens = tok.encode(prompt, bos=True)
        if not prompt_tokens:
            prompt_tokens = [tok.bos_id if tok.bos_id >= 0 else 0]

        out = bytearray()

        def emit(piece: bytes):
            out.extend(piece)
            if on_piece:
                on_piece(piece.decode("utf-8", errors="replace"))

        if echo and prompt_tokens[0] != tok.bos_id:
            emit(tok.decode_piece(tok.bos_id, prompt_tokens[0]))

        read_bytes = 0
        start = time.perf_counter()

        # batched prefill over all but the last prompt token
        n_prompt = len(prompt_tokens)
        pos = 0
        if n_prompt > 1:
            self.prefill_tokens(prompt_tokens[:-1], pos_offset)
            read_bytes += (n_prompt - 1) * self.n_bandwidth  # conservative
            for p in range(n_prompt - 1):
                read_bytes += kv_cache_bytes(self.cfg, self.kv_bits, p + pos_offset)
                if echo and p + 1 < n_prompt:
                    emit(tok.decode_piece(prompt_tokens[p], prompt_tokens[p + 1]))
            pos = n_prompt - 1

        token = prompt_tokens[-1]
        logits_last = None
        n_generated = 0
        stops = (tok.bos_id, tok.eos_id, tok.eot_id)
        greedy = temperature == 0.0 or minp >= 1.0
        device_loop = greedy or not reference_sampling

        if device_loop:
            # fast path for EVERY sampling mode: decode CHUNK tokens per
            # compiled program (greedy argmax or on-device min-p sampling
            # inside the scan; zero host round-trips inside; stop tokens
            # checked per chunk — cache rows past a stop hold garbage but
            # stay masked until overwritten at those positions)
            CHUNK = 16
            if not greedy:
                import jax
                key = jax.random.PRNGKey(seed)
                temps = jnp.full((1,), temperature, jnp.float32)
                minps = jnp.full((1,), minp, jnp.float32)
            stopped = False
            while not stopped and (pos < steps or steps < 0):
                n = CHUNK if steps < 0 else max(1, min(CHUNK, steps - pos))
                # chunks that cannot reach the window edge compile to the
                # cheaper non-rolling program (no sink-rotation ops)
                roll = pos + pos_offset + n >= self.cfg.seq_len
                if greedy:
                    toks_d, self.cache, logits_d = M.decode_scan(
                        self.cfg, self.weights, jnp.array([token], jnp.int32),
                        jnp.array([pos + pos_offset], jnp.int32),
                        self.cache, n, rolling=roll)
                else:
                    key, sub = jax.random.split(key)
                    toks_d, self.cache, logits_d = M.decode_scan_sampled(
                        self.cfg, self.weights, jnp.array([token], jnp.int32),
                        jnp.array([pos + pos_offset], jnp.int32),
                        self.cache, n, sub, temps, minps, rolling=roll)
                chunk_toks = np.asarray(toks_d[0])
                for i, nxt in enumerate(chunk_toks):
                    read_bytes += self.n_bandwidth
                    read_bytes += kv_cache_bytes(self.cfg, self.kv_bits,
                                                 pos + pos_offset)
                    pos += 1
                    n_generated += 1
                    last_step = i
                    if int(nxt) in stops:
                        stopped = True
                        break
                    emit(tok.decode_piece(token, int(nxt)))
                    token = int(nxt)
                # fingerprint at the exact position decoded last (a stop
                # token mid-chunk must not hash a later step's logits)
                logits_last = np.asarray(logits_d[last_step, 0], np.float32)

        while not device_loop and (pos < steps or steps < 0):
            logits = self.step(token, pos + pos_offset)
            read_bytes += self.n_bandwidth
            read_bytes += kv_cache_bytes(self.cfg, self.kv_bits, pos + pos_offset)
            logits_last = logits
            nxt = sampler.sample(logits)
            pos += 1
            n_generated += 1
            if nxt in stops:
                break
            emit(tok.decode_piece(token, nxt))
            token = nxt

        seconds = time.perf_counter() - start
        h = M.logits_hash(logits_last) if logits_last is not None else 0
        return GenStats(tokens=pos, seconds=seconds, read_bytes=read_bytes,
                        logits_hash=h, text=out.decode("utf-8", errors="replace"))

    def perplexity(self, text: str, steps: int = 0,
                   progress: Callable[[str], None] | None = None):
        """Chunked perplexity with running mean ± SE (src/run.c:258-316).

        Prefill-based: each window chunk is teacher-forced in one batched
        forward, logits for every position come back at once.
        """
        cfg = self.cfg
        toks = self.tokenizer.encode(text, bos=True)
        n = len(toks)
        chunk = steps if steps > 0 else cfg.seq_len

        s = ss = den = 0.0
        ppl = pplerr = 0.0
        i = 0
        while i + 1 < n:
            t = min(chunk, n - i)  # feed toks[i:i+t] at positions 0..t-1
            self.reset()
            out, self.cache = M.prefill(
                cfg, self.weights, jnp.asarray([toks[i : i + t]], jnp.int32),
                jnp.zeros((1,), jnp.int32), self.cache, logits_mode="all")
            logits = np.asarray(out[0], np.float32)  # (t, V)
            # logits[j] predicts toks[i+j+1] (the last one crosses the
            # chunk boundary, matching the serial reference loop)
            for j in range(t):
                if i + j + 1 >= n:
                    break
                lp = math.log(max(softmax_prob(toks[i + j + 1], logits[j]), 1e-45))
                s += lp
                ss += lp * lp
                den += 1
                ppl = math.exp(-s / den)
                pplerr = ppl * math.sqrt(max(ss - s * s / den, 0.0) / den / den)
            if progress:
                progress(f"# progress ({int(den)}/{n - 1}): {ppl:.3f} ± {pplerr:.3f}")
            i += t
        return ppl, pplerr, int(den)


# -- chat templates (vocab-sniffed, reference: src/run.c:318-347) -------------

_TEMPLATES = [
    ("<|eot_id|>",  # llama3
     "<|start_header_id|>system<|end_header_id|>\n\n{sys}<|eot_id|>"
     "<|start_header_id|>user<|end_header_id|>\n\n{user}<|eot_id|>"
     "<|start_header_id|>assistant<|end_header_id|>\n\n",
     "<|start_header_id|>user<|end_header_id|>\n\n{user}<|eot_id|>"
     "<|start_header_id|>assistant<|end_header_id|>\n\n"),
    ("<|im_start|>",  # chatml
     "<|im_start|>system\n{sys}<|im_end|>\n<|im_start|>user\n{user}<|im_end|>\n"
     "<|im_start|>assistant\n",
     "\n<|im_start|>user\n{user}<|im_end|>\n<|im_start|>assistant\n"),
    ("<start_of_turn>",  # gemma
     "<start_of_turn>user\nSYSTEM: {sys}\n\n{user}<end_of_turn>\n<start_of_turn>model\n",
     "\n<start_of_turn>user\n{user}<end_of_turn>\n<start_of_turn>model\n"),
    ("<|START_OF_TURN_TOKEN|>",  # cohere
     "<|START_OF_TURN_TOKEN|><|SYSTEM_TOKEN|>{sys}<|END_OF_TURN_TOKEN|>"
     "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>{user}<|END_OF_TURN_TOKEN|>"
     "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>",
     "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>{user}<|END_OF_TURN_TOKEN|>"
     "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>"),
    ("<|assistant|>",  # phi3
     "<|system|>\n{sys}<|end|>\n<|user|>\n{user}<|end|>\n<|assistant|>\n",
     "\n<|user|>\n{user}<|end|>\n<|assistant|>\n"),
    ("<|beginofsystem|>",  # k2
     "<|beginofsystem|>{sys}<|endofsystemprompt|><|beginofuser|>{user}<|beginofsystem|>",
     "<|beginofuser|>{user}<|beginofsystem|>"),
]
_LLAMA2 = ("[INST] <<SYS>>\n{sys}\n<</SYS>>\n\n{user} [/INST]",
           "[INST] {user} [/INST]")


def chat_template(tokenizer: Tokenizer, has_system: bool) -> str:
    for marker, with_sys, without in _TEMPLATES:
        if tokenizer.find(marker) >= 0:
            return with_sys if has_system else without
    return _LLAMA2[0] if has_system else _LLAMA2[1]


def chat_loop(engine: Engine, system_prompt: str = "", cli_prompt: str | None = None,
              *, temperature: float = 1.0, minp: float = 0.1, seed: int = 42,
              reference_sampling: bool = False,
              read_line: Callable[[], str] = input,
              write: Callable[[str], None] = lambda s: print(s, end="", flush=True),
              max_turns: int | None = None):
    """Interactive chat (reference: src/run.c:349-419). Testable via injected IO.

    Decodes in on-device chunks by default (min-p sampling inside the scan,
    same fast path as Engine.generate); tokens decoded past the stop are
    discarded — their cache rows are overwritten when the next turn's
    prefill reaches those positions. ``reference_sampling=True`` restores
    the per-token host loop with the xorshift64* stream."""
    import jax

    tok = engine.tokenizer
    sampler = Sampler(engine.cfg.vocab_size, seed, temperature, minp)
    device_loop = not reference_sampling
    key = jax.random.PRNGKey(seed)
    temps = jnp.full((1,), temperature, jnp.float32)
    minps = jnp.full((1,), minp, jnp.float32)
    CHUNK = 16
    pos = 0
    turns = 0
    while max_turns is None or turns < max_turns:
        if pos == 0 and cli_prompt is not None:
            user = cli_prompt + "\n"
        else:
            write(f"[{pos}/{engine.cfg.seq_len}] User: ")
            try:
                user = read_line()
            except EOFError:
                return
        tpl = chat_template(tok, bool(system_prompt) and pos == 0)
        rendered = (tpl.format(sys=system_prompt, user=user.rstrip("\n"))
                    if "{sys}" in tpl else tpl.format(user=user.rstrip("\n")))
        prompt_tokens = tok.encode(rendered, bos=(pos == 0))

        write("\nAssistant: ")
        if len(prompt_tokens) > 1:
            engine.prefill_tokens(prompt_tokens[:-1], pos)
        pos += len(prompt_tokens) - 1
        token = prompt_tokens[-1]
        stopped = False
        while not stopped:
            if device_loop:
                key, sub = jax.random.split(key)
                toks_d, engine.cache, _ = M.decode_scan_sampled(
                    engine.cfg, engine.weights, jnp.array([token], jnp.int32),
                    jnp.array([pos], jnp.int32), engine.cache, CHUNK,
                    sub, temps, minps,
                    rolling=pos + CHUNK >= engine.cfg.seq_len)
                chunk = [int(t) for t in np.asarray(toks_d[0])]
            else:
                chunk = [sampler.sample(engine.step(token, pos))]
            for nxt in chunk:
                pos += 1
                if nxt in (tok.eos_id, tok.eot_id):
                    write("\n\n")
                    stopped = True
                    break
                write(tok.decode_piece(token, nxt).decode("utf-8",
                                                          errors="replace"))
                token = nxt
        turns += 1
