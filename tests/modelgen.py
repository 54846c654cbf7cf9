"""Synthesize tiny random .calm containers for tests and benchmarks."""

from __future__ import annotations

import math

import numpy as np

from calm_tpu import container, quant
from calm_tpu.config import ModelConfig


def byte_vocab(vocab_size: int):
    """Minimal vocab: specials + 256 byte-fallback pieces + filler."""
    pieces = [b"<unk>", b"<s>", b"</s>"]
    pieces += [f"<0x{b:02X}>".encode() for b in range(256)]
    while len(pieces) < vocab_size:
        pieces.append(f"<fill{len(pieces)}>".encode())
    assert len(pieces) == vocab_size
    tokens = np.frombuffer(b"".join(p + b"\0" for p in pieces), dtype=np.uint8)
    scores = np.zeros(vocab_size, dtype=np.float32)
    return tokens, scores


def tiny_config(dtype="fp16", seq_len=32, moe=False, **kw) -> ModelConfig:
    base = dict(dim=48, hidden_dim=64, head_dim=12, n_layers=2, n_heads=4,
                n_kv_heads=2, vocab_size=268, seq_len=seq_len,
                rope_theta=10000.0, rotary_dim=12, norm_eps=1e-5,
                norm_ln=False, dtype=dtype, bos_token_id=1, eos_token_id=2)
    if moe:
        base.update(n_experts=4, n_experts_ac=2)
    base.update(kw)
    return ModelConfig(**base)


def write_tiny_model(path: str, cfg: ModelConfig, seed: int = 0,
                     tied: bool = False, bias: bool = False) -> ModelConfig:
    rng = np.random.default_rng(seed)
    fmt = cfg.dtype
    D, Hd, Q, KV, V, E, L = (cfg.dim, cfg.hidden_dim, cfg.q_dim, cfg.kv_dim,
                             cfg.vocab_size, cfg.n_experts, cfg.n_layers)

    def rand(*shape, scale=None):
        scale = scale if scale is not None else 1.0 / math.sqrt(shape[-1])
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    t = {}

    def put(name, arr, per_expert=False):
        """Quantize into the container; fp8e4 emits a side .scale tensor
        (per expert for stacked MoE weights, matching the converter)."""
        if per_expert:
            qs, ss = zip(*[quant.quantize_scaled(a, fmt) for a in arr])
            t[name] = np.stack(qs)
            if ss[0] is not None:
                t[name + ".scale"] = np.stack(ss)
        else:
            qd, s = quant.quantize_scaled(arr, fmt)
            t[name] = qd
            if s is not None:
                t[name + ".scale"] = s

    put("model.embed.weight", rand(V, D, scale=0.4))
    for l in range(L):
        p = f"model.layers.{l}"
        t[f"{p}.attn.norm.weight"] = 1.0 + rand(D, scale=0.05)
        put(f"{p}.attn.wq.weight", rand(Q, D))
        put(f"{p}.attn.wk.weight", rand(KV, D))
        put(f"{p}.attn.wv.weight", rand(KV, D))
        put(f"{p}.attn.wo.weight", rand(D, Q))
        if bias:
            t[f"{p}.attn.wqkv.bias"] = rand(Q + 2 * KV, scale=0.05)
        if not cfg.norm_par:
            t[f"{p}.mlp.norm.weight"] = 1.0 + rand(D, scale=0.05)
        if E:
            put(f"{p}.moegate.weight", rand(E, D))
            put(f"{p}.mlp.w1.weight", rand(E, Hd, D), per_expert=True)
            put(f"{p}.mlp.w2.weight", rand(E, D, Hd), per_expert=True)
            put(f"{p}.mlp.w3.weight", rand(E, Hd, D), per_expert=True)
        else:
            put(f"{p}.mlp.w1.weight", rand(Hd, D))
            put(f"{p}.mlp.w2.weight", rand(D, Hd))
            put(f"{p}.mlp.w3.weight", rand(Hd, D))
    t["model.norm.weight"] = 1.0 + rand(D, scale=0.05)
    if not tied:
        put("model.output.weight", rand(V, D, scale=0.4))

    tokens, scores = byte_vocab(V)
    t["tokenizer.tokens"] = tokens
    t["tokenizer.scores"] = scores

    container.write_tensors(path, t, cfg.to_metadata())
    return cfg
