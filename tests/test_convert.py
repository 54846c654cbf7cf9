"""Converter end-to-end: tiny HF Llama checkpoint -> .calm -> engine logits
must match the HF torch forward (validates permute_reverse, weight mapping,
metadata extraction, tokenizer ingestion)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import convert as convert_mod  # noqa: E402
from calm_tpu import container  # noqa: E402
from calm_tpu.config import ModelConfig  # noqa: E402
from calm_tpu.tokenizer import Tokenizer  # noqa: E402

HF_CONFIG = {
    "architectures": ["LlamaForCausalLM"],
    "hidden_size": 48,
    "intermediate_size": 64,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "vocab_size": 268,
    "max_position_embeddings": 128,
    "bos_token_id": 1,
    "eos_token_id": 2,
    "rope_theta": 10000.0,
    "rms_norm_eps": 1e-5,
    "hidden_act": "silu",
    "tie_word_embeddings": False,
}


def make_hf_checkpoint(d: Path):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(**{k: v for k, v in HF_CONFIG.items() if k != "architectures"},
                      attention_bias=False)
    torch.manual_seed(7)
    model = LlamaForCausalLM(cfg).eval()

    # write weights with our own safetensors writer (f32)
    tensors = {k: v.detach().numpy().astype(np.float32)
               for k, v in model.state_dict().items()
               if not k.endswith("rotary_emb.inv_freq")}
    container.write_tensors(str(d / "model.safetensors"), tensors, {})

    with open(d / "config.json", "w") as f:
        json.dump(HF_CONFIG, f)

    # sentencepiece-style tokenizer.json with byte fallback
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for b in range(256):
        vocab[f"<0x{b:02X}>"] = 3 + b
    vocab["▁hi"] = 259
    for i in range(260, 268):
        vocab[f"<fill{i}>"] = i
    tok = {"model": {"vocab": vocab, "merges": [], "byte_fallback": True},
           "added_tokens": []}
    with open(d / "tokenizer.json", "w") as f:
        json.dump(tok, f)
    return model


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf")
    model = make_hf_checkpoint(d)
    out = str(d / "model.calm")
    convert_mod.main([out, str(d), "--dtype", "fp16"])
    return d, model, out


def test_metadata(converted):
    _, _, out = converted
    tf = container.TensorFile(out)
    cfg = ModelConfig.from_metadata(tf.metadata)
    assert cfg.dim == 48 and cfg.n_layers == 2 and cfg.n_kv_heads == 2
    assert cfg.arch == "llama" and cfg.dtype == "fp16"
    assert cfg.bos_token_id == 1 and cfg.eos_token_id == 2
    assert not cfg.norm_ln and not cfg.act_gelu


def test_tokenizer_ingested(converted):
    _, _, out = converted
    tf = container.TensorFile(out)
    tok = Tokenizer.from_container(tf)
    assert tok.byte_fallbacks == 3
    # the ▁-piece got mapped to a leading-space piece
    assert tok.find(b" hi") == 259


def test_logits_match_hf(converted):
    import torch

    d, model, out = converted
    from calm_tpu.engine import Engine

    tokens = [1, 10, 25, 199, 42]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].numpy()

    eng = Engine(out, context=32, kv_dtype="fp16")
    import jax.numpy as jnp
    from calm_tpu import model as M
    logits, _ = M.prefill(eng.cfg, eng.weights,
                          jnp.asarray([tokens], jnp.int32),
                          jnp.zeros((1,), jnp.int32), eng.cache,
                          logits_mode="all")
    got = np.asarray(logits[0], np.float32)
    np.testing.assert_allclose(got, hf_logits, rtol=5e-2, atol=5e-2)
    # tight check on argmax agreement (what decoding actually consumes)
    assert (got.argmax(-1) == hf_logits.argmax(-1)).all()


# ---- additional architecture families: HF torch forward vs engine ----


def _mini_tokenizer_json(d: Path, vocab_size: int):
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for b in range(256):
        vocab[f"<0x{b:02X}>"] = 3 + b
    for i in range(259, vocab_size):
        vocab[f"<fill{i}>"] = i
    tok = {"model": {"vocab": vocab, "merges": [], "byte_fallback": True},
           "added_tokens": []}
    with open(d / "tokenizer.json", "w") as f:
        json.dump(tok, f)


def _convert_and_compare(d: Path, model, hf_config: dict, dtype="fp16",
                         rtol=5e-2, atol=5e-2):
    import torch
    from calm_tpu import container as C

    tensors = {k: v.detach().float().numpy()
               for k, v in model.state_dict().items()
               if not k.endswith("rotary_emb.inv_freq")}
    C.write_tensors(str(d / "model.safetensors"), tensors, {})
    with open(d / "config.json", "w") as f:
        json.dump(hf_config, f)
    _mini_tokenizer_json(d, hf_config["vocab_size"])

    out = str(d / "model.calm")
    convert_mod.main([out, str(d), "--dtype", dtype])

    tokens = [1, 10, 25, 199, 42]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].numpy()

    import jax.numpy as jnp
    from calm_tpu import model as M
    from calm_tpu.engine import Engine
    eng = Engine(out, context=32, kv_dtype="fp16")
    logits, _ = M.prefill(eng.cfg, eng.weights,
                          jnp.asarray([tokens], jnp.int32),
                          jnp.zeros((1,), jnp.int32), eng.cache,
                          logits_mode="all")
    got = np.asarray(logits[0], np.float32)
    np.testing.assert_allclose(got, hf_logits, rtol=rtol, atol=atol)
    assert (got.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.95


def test_convert_qwen2(tmp_path):
    """Qwen2: QKV bias riding the fused wqkv.bias tensor + permute."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf = {"architectures": ["Qwen2ForCausalLM"], "hidden_size": 48,
          "intermediate_size": 64, "num_hidden_layers": 2,
          "num_attention_heads": 4, "num_key_value_heads": 2,
          "vocab_size": 268, "max_position_embeddings": 128,
          "bos_token_id": 1, "eos_token_id": 2, "rope_theta": 10000.0,
          "rms_norm_eps": 1e-5, "hidden_act": "silu",
          "tie_word_embeddings": False}
    cfg = Qwen2Config(**{k: v for k, v in hf.items() if k != "architectures"})
    torch.manual_seed(3)
    model = Qwen2ForCausalLM(cfg).eval()
    assert model.model.layers[0].self_attn.q_proj.bias is not None
    _convert_and_compare(tmp_path, model, hf)


def test_convert_mixtral_moe(tmp_path):
    """Mixtral: expert stacking + gate; top-2 routing parity."""
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    hf = {"architectures": ["MixtralForCausalLM"], "hidden_size": 48,
          "intermediate_size": 64, "num_hidden_layers": 2,
          "num_attention_heads": 4, "num_key_value_heads": 2,
          "vocab_size": 268, "max_position_embeddings": 128,
          "bos_token_id": 1, "eos_token_id": 2, "rope_theta": 10000.0,
          "rms_norm_eps": 1e-5, "hidden_act": "silu",
          "num_local_experts": 4, "num_experts_per_tok": 2,
          "tie_word_embeddings": False}
    cfg = MixtralConfig(**{k: v for k, v in hf.items() if k != "architectures"})
    torch.manual_seed(5)
    model = MixtralForCausalLM(cfg).eval()
    _convert_and_compare(tmp_path, model, hf)


def test_convert_gemma(tmp_path):
    """Gemma: +1 norm offset and sqrt(dim) embed scale folded at convert."""
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    hf = {"architectures": ["GemmaForCausalLM"], "hidden_size": 48,
          "intermediate_size": 64, "num_hidden_layers": 2,
          "num_attention_heads": 4, "num_key_value_heads": 2,
          "head_dim": 12, "vocab_size": 268, "max_position_embeddings": 128,
          "bos_token_id": 1, "eos_token_id": 2, "rope_theta": 10000.0,
          "rms_norm_eps": 1e-5, "hidden_act": "gelu",
          "tie_word_embeddings": True}
    cfg = GemmaConfig(**{k: v for k, v in hf.items() if k != "architectures"})
    torch.manual_seed(9)
    model = GemmaForCausalLM(cfg).eval()
    _convert_and_compare(tmp_path, model, hf, rtol=8e-2, atol=8e-2)


def test_pad_vocab(tmp_path):
    """--pad-vocab rounds vocab to 128 multiple; logits for real tokens and
    tokenizer behavior are unchanged; padded pieces never match."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    d = tmp_path
    model = make_hf_checkpoint(d)
    out = str(d / "padded.calm")
    convert_mod.main([out, str(d), "--dtype", "fp16", "--pad-vocab"])

    tf = container.TensorFile(out)
    cfg = ModelConfig.from_metadata(tf.metadata)
    assert cfg.vocab_size == 384  # 268 -> next multiple of 128

    tok = Tokenizer.from_container(tf)
    assert tok.vocab_size == 384
    assert tok.encode("hi", bos=False)  # still tokenizes

    from calm_tpu.engine import Engine
    import jax.numpy as jnp
    from calm_tpu import model as M
    tokens = [1, 10, 25, 199, 42]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].numpy()
    eng = Engine(out, context=32, kv_dtype="fp16")
    logits, _ = M.prefill(eng.cfg, eng.weights,
                          jnp.asarray([tokens], jnp.int32),
                          jnp.zeros((1,), jnp.int32), eng.cache,
                          logits_mode="all")
    got = np.asarray(logits[0], np.float32)
    np.testing.assert_allclose(got[:, :268], hf_logits, rtol=5e-2, atol=5e-2)


def test_convert_phi3(tmp_path):
    """Phi3: fused qkv_proj and gate_up_proj splits."""
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM

    hf = {"architectures": ["Phi3ForCausalLM"], "hidden_size": 48,
          "intermediate_size": 64, "num_hidden_layers": 2,
          "num_attention_heads": 4, "num_key_value_heads": 2,
          "vocab_size": 268, "max_position_embeddings": 128,
          "bos_token_id": 1, "eos_token_id": 2, "pad_token_id": 0,
          "rope_theta": 10000.0, "rms_norm_eps": 1e-5, "hidden_act": "silu",
          "tie_word_embeddings": False}
    cfg = Phi3Config(**{k: v for k, v in hf.items() if k != "architectures"})
    torch.manual_seed(11)
    model = Phi3ForCausalLM(cfg).eval()
    assert any("qkv_proj" in k for k in model.state_dict())
    _convert_and_compare(tmp_path, model, hf)


def test_convert_cohere(tmp_path):
    """Cohere: parallel-LN blocks, logit_scale folded into the final norm,
    tied embeddings, non-interleaved (native) rope — no permute."""
    import torch
    from transformers import CohereConfig, CohereForCausalLM

    hf = {"architectures": ["CohereForCausalLM"], "hidden_size": 48,
          "intermediate_size": 64, "num_hidden_layers": 2,
          "num_attention_heads": 4, "num_key_value_heads": 2,
          "vocab_size": 268, "max_position_embeddings": 128,
          "bos_token_id": 1, "eos_token_id": 2, "rope_theta": 10000.0,
          "layer_norm_eps": 1e-5, "logit_scale": 0.125,
          "hidden_act": "silu", "tie_word_embeddings": True,
          "use_qk_norm": False}
    cfg = CohereConfig(**{k: v for k, v in hf.items() if k != "architectures"})
    torch.manual_seed(13)
    model = CohereForCausalLM(cfg).eval()
    _convert_and_compare(tmp_path, model, hf)


def test_convert_olmoe(tmp_path):
    """OLMoE: full-vector q/k RMSNorm (which the reference converter warns it
    does NOT support — we do) + softmax-over-all gate without top-k renorm."""
    import torch
    from transformers import OlmoeConfig, OlmoeForCausalLM

    hf = {"architectures": ["OlmoeForCausalLM"], "hidden_size": 48,
          "intermediate_size": 64, "num_hidden_layers": 2,
          "num_attention_heads": 4, "num_key_value_heads": 2,
          "vocab_size": 268, "max_position_embeddings": 128,
          "bos_token_id": 1, "eos_token_id": 2, "rope_theta": 10000.0,
          "rms_norm_eps": 1e-5, "hidden_act": "silu",
          "num_experts": 4, "num_experts_per_tok": 2,
          "norm_topk_prob": False, "tie_word_embeddings": False}
    cfg = OlmoeConfig(**{k: v for k, v in hf.items() if k != "architectures"})
    torch.manual_seed(17)
    model = OlmoeForCausalLM(cfg).eval()
    assert any("q_norm" in k for k in model.state_dict())
    _convert_and_compare(tmp_path, model, hf)


def test_convert_dbrx(tmp_path):
    """DBRX: fused Wqkv split, qkv clip, LayerNorm(no bias), packed expert
    tensors (w1/v1/w2 reshaped + transposed), p=1-renormalized router."""
    import torch
    from transformers import DbrxConfig, DbrxForCausalLM

    hf = {"architectures": ["DbrxForCausalLM"], "d_model": 48,
          "n_heads": 4, "n_layers": 2, "max_seq_len": 128,
          "vocab_size": 268,
          "attn_config": {"clip_qkv": 8.0, "kv_n_heads": 2,
                          "rope_theta": 10000.0},
          "ffn_config": {"ffn_hidden_size": 64, "moe_num_experts": 4,
                         "moe_top_k": 2}}
    cfg = DbrxConfig(**{k: v for k, v in hf.items() if k != "architectures"})
    torch.manual_seed(19)
    model = DbrxForCausalLM(cfg).eval()
    _convert_and_compare(tmp_path, model, hf)


def test_convert_olmo_raw(tmp_path):
    """OLMo (allenai raw checkpoint format): fused att_proj/ff_proj splits,
    non-parametric LayerNorm, qkv clip. The raw checkpoint is synthesized
    from an HF OlmoForCausalLM state dict (the inverse of HF's conversion),
    and the converted engine must match the HF torch forward."""
    import torch
    from transformers import OlmoConfig, OlmoForCausalLM

    D, I = 48, 64
    cfg = OlmoConfig(hidden_size=D, intermediate_size=I, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=4,
                     vocab_size=268, max_position_embeddings=128,
                     bos_token_id=1, eos_token_id=2, rope_theta=10000.0,
                     hidden_act="silu", clip_qkv=0.5,
                     tie_word_embeddings=False)
    torch.manual_seed(23)
    model = OlmoForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()
          if not k.endswith("rotary_emb.inv_freq")}

    raw = {"model.transformer.wte.weight": sd["model.embed_tokens.weight"],
           "model.transformer.ff_out.weight": sd["lm_head.weight"]}
    for l in range(2):
        p, b = f"model.layers.{l}", f"model.transformer.blocks.{l}"
        raw[f"{b}.att_proj.weight"] = np.concatenate(
            [sd[f"{p}.self_attn.q_proj.weight"],
             sd[f"{p}.self_attn.k_proj.weight"],
             sd[f"{p}.self_attn.v_proj.weight"]])
        raw[f"{b}.attn_out.weight"] = sd[f"{p}.self_attn.o_proj.weight"]
        # raw ff_proj chunks as (x1=up, x2=gate): act(x2) * x1
        raw[f"{b}.ff_proj.weight"] = np.concatenate(
            [sd[f"{p}.mlp.up_proj.weight"], sd[f"{p}.mlp.gate_proj.weight"]])
        raw[f"{b}.ff_out.weight"] = sd[f"{p}.mlp.down_proj.weight"]

    from calm_tpu import container as C
    d = tmp_path
    C.write_tensors(str(d / "model.safetensors"), raw, {})
    raw_cfg = {"architectures": ["OLMoForCausalLM"], "d_model": D,
               "n_layers": 2, "n_heads": 4, "mlp_hidden_size": 2 * I,
               "embedding_size": 268, "max_sequence_length": 128,
               "eos_token_id": 2, "clip_qkv": 0.5,
               "activation_type": "swiglu", "weight_tying": False}
    with open(d / "config.json", "w") as f:
        json.dump(raw_cfg, f)
    _mini_tokenizer_json(d, 268)

    out = str(d / "model.calm")
    convert_mod.main([out, str(d), "--dtype", "fp16"])

    tokens = [1, 10, 25, 199, 42]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].numpy()

    import jax.numpy as jnp
    from calm_tpu import model as M
    from calm_tpu.engine import Engine
    eng = Engine(out, context=32, kv_dtype="fp16")
    assert eng.cfg.norm_ln and eng.cfg.qkv_clip == 0.5
    logits, _ = M.prefill(eng.cfg, eng.weights,
                          jnp.asarray([tokens], jnp.int32),
                          jnp.zeros((1,), jnp.int32), eng.cache,
                          logits_mode="all")
    got = np.asarray(logits[0], np.float32)
    np.testing.assert_allclose(got, hf_logits, rtol=5e-2, atol=5e-2)
    assert (got.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.95


def test_convert_internlm2(tmp_path):
    """InternLM2: fused wqkv with (kv_head, kv_mul+2, hd) grouping + renamed
    tensors. InternLM2 is llama-architecture, so the checkpoint is synthesized
    from an HF Llama state dict regrouped into the internlm2 layout and the
    Llama torch forward is the oracle."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    D, HD, NH, NKV = 48, 12, 4, 2
    cfg = LlamaConfig(hidden_size=D, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=NH,
                      num_key_value_heads=NKV, vocab_size=268,
                      max_position_embeddings=128, bos_token_id=1,
                      eos_token_id=2, rope_theta=10000.0, rms_norm_eps=1e-5,
                      hidden_act="silu", tie_word_embeddings=False,
                      attention_bias=False)
    torch.manual_seed(29)
    model = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()
          if not k.endswith("rotary_emb.inv_freq")}

    kv_mul = NH // NKV
    raw = {"model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
           "model.norm.weight": sd["model.norm.weight"],
           "output.weight": sd["lm_head.weight"]}
    for l in range(2):
        p = f"model.layers.{l}"
        q = sd[f"{p}.self_attn.q_proj.weight"].reshape(NKV, kv_mul, HD, D)
        k = sd[f"{p}.self_attn.k_proj.weight"].reshape(NKV, 1, HD, D)
        v = sd[f"{p}.self_attn.v_proj.weight"].reshape(NKV, 1, HD, D)
        raw[f"{p}.attention.wqkv.weight"] = np.concatenate(
            [q, k, v], axis=1).reshape((kv_mul + 2) * NKV * HD, D)
        raw[f"{p}.attention.wo.weight"] = sd[f"{p}.self_attn.o_proj.weight"]
        raw[f"{p}.attention_norm.weight"] = sd[f"{p}.input_layernorm.weight"]
        raw[f"{p}.ffn_norm.weight"] = sd[f"{p}.post_attention_layernorm.weight"]
        raw[f"{p}.feed_forward.w1.weight"] = sd[f"{p}.mlp.gate_proj.weight"]
        raw[f"{p}.feed_forward.w2.weight"] = sd[f"{p}.mlp.down_proj.weight"]
        raw[f"{p}.feed_forward.w3.weight"] = sd[f"{p}.mlp.up_proj.weight"]

    from calm_tpu import container as C
    d = tmp_path
    C.write_tensors(str(d / "model.safetensors"), raw, {})
    raw_cfg = {"architectures": ["InternLM2ForCausalLM"], "hidden_size": D,
               "intermediate_size": 64, "num_hidden_layers": 2,
               "num_attention_heads": NH, "num_key_value_heads": NKV,
               "vocab_size": 268, "max_position_embeddings": 128,
               "bos_token_id": 1, "eos_token_id": 2, "rope_theta": 10000.0,
               "rms_norm_eps": 1e-5, "hidden_act": "silu"}
    with open(d / "config.json", "w") as f:
        json.dump(raw_cfg, f)
    _mini_tokenizer_json(d, 268)

    out = str(d / "model.calm")
    convert_mod.main([out, str(d), "--dtype", "fp16"])

    tokens = [1, 10, 25, 199, 42]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].numpy()

    import jax.numpy as jnp
    from calm_tpu import model as M
    from calm_tpu.engine import Engine
    eng = Engine(out, context=32, kv_dtype="fp16")
    logits, _ = M.prefill(eng.cfg, eng.weights,
                          jnp.asarray([tokens], jnp.int32),
                          jnp.zeros((1,), jnp.int32), eng.cache,
                          logits_mode="all")
    got = np.asarray(logits[0], np.float32)
    np.testing.assert_allclose(got, hf_logits, rtol=5e-2, atol=5e-2)
    assert (got.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.95


def test_convert_fp8e4(tmp_path):
    """--dtype fp8e4: e4m3 weights + per-tensor power-of-two scales (a
    format the reference does not ship; its dtype table reserves F8_E4M3,
    reference src/tensors.c:75-83)."""
    import torch

    d = tmp_path
    model = make_hf_checkpoint(d)
    out = str(d / "model.calm")
    convert_mod.main([out, str(d), "--dtype", "fp8e4"])

    tf = container.TensorFile(out)
    cfg = ModelConfig.from_metadata(tf.metadata)
    assert cfg.dtype == "fp8e4"
    assert tf.find("model.layers.0.attn.wq.weight.scale") is not None

    tokens = [1, 10, 25, 199, 42]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].numpy()

    import jax.numpy as jnp
    from calm_tpu import model as M
    from calm_tpu.engine import Engine
    eng = Engine(out, context=32, kv_dtype="fp16")
    logits, _ = M.prefill(eng.cfg, eng.weights,
                          jnp.asarray([tokens], jnp.int32),
                          jnp.zeros((1,), jnp.int32), eng.cache,
                          logits_mode="all")
    got = np.asarray(logits[0], np.float32)
    # 8-bit weights: loose elementwise, tight argmax agreement
    assert (got.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.9
    np.testing.assert_allclose(got, hf_logits, rtol=0.5, atol=0.5)


def test_convert_minicpm(tmp_path):
    """MiniCPM (mu-p scaling folds): the converter folds scale_emb into the
    embeddings, scale_depth/sqrt(L) into both residual projections, and
    dim_model_base/hidden (over the tied embed scale) into the final norm,
    so the engine stays scale-free. Validated EXACTLY against a llama
    forward on pre-folded weights — identical semantics because rmsnorm is
    scale-invariant, so folding the scales into the linear maps reproduces
    MiniCPM's h = h + rs*branch / logit-scaled head token-for-token."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    D, I, L = 48, 64, 2
    s_emb, s_depth, dmb = 12.0, 1.4, 32
    rs = s_depth / (L ** 0.5)
    final = dmb / D
    lcfg = LlamaConfig(hidden_size=D, intermediate_size=I,
                       num_hidden_layers=L, num_attention_heads=4,
                       num_key_value_heads=2, vocab_size=268,
                       max_position_embeddings=128, rms_norm_eps=1e-5,
                       rope_theta=10000.0, bos_token_id=1, eos_token_id=2,
                       tie_word_embeddings=True, attention_bias=False)
    torch.manual_seed(31)
    raw_model = LlamaForCausalLM(lcfg).eval()
    sd = {k: v.detach().float().numpy().copy()
          for k, v in raw_model.state_dict().items()
          if "inv_freq" not in k and k != "lm_head.weight"}

    # expectation: llama on FOLDED weights == minicpm on the raw weights
    folded = LlamaForCausalLM(lcfg).eval()
    folded.load_state_dict(raw_model.state_dict(), strict=False)
    with torch.no_grad():
        folded.model.embed_tokens.weight.mul_(s_emb)  # tied head follows
        for l in range(L):
            folded.model.layers[l].self_attn.o_proj.weight.mul_(rs)
            folded.model.layers[l].mlp.down_proj.weight.mul_(rs)
        folded.model.norm.weight.mul_(final / s_emb)

    from calm_tpu import container as C
    d = tmp_path
    C.write_tensors(str(d / "model.safetensors"), sd, {})
    cfg_json = {"architectures": ["MiniCPMForCausalLM"], "hidden_size": D,
                "intermediate_size": I, "num_hidden_layers": L,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "vocab_size": 268, "max_position_embeddings": 128,
                "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
                "bos_token_id": 1, "eos_token_id": 2, "hidden_act": "silu",
                "scale_emb": s_emb, "scale_depth": s_depth,
                "dim_model_base": dmb, "tie_word_embeddings": True}
    with open(d / "config.json", "w") as f:
        json.dump(cfg_json, f)
    _mini_tokenizer_json(d, 268)

    out = str(d / "model.calm")
    convert_mod.main([out, str(d), "--dtype", "fp16"])

    tokens = [1, 10, 25, 199, 42]
    with torch.no_grad():
        hf_logits = folded(torch.tensor([tokens])).logits[0].numpy()

    import jax.numpy as jnp
    from calm_tpu import model as M
    from calm_tpu.engine import Engine
    eng = Engine(out, context=32, kv_dtype="fp16")
    logits, _ = M.prefill(eng.cfg, eng.weights,
                          jnp.asarray([tokens], jnp.int32),
                          jnp.zeros((1,), jnp.int32), eng.cache,
                          logits_mode="all")
    got = np.asarray(logits[0], np.float32)
    np.testing.assert_allclose(got, hf_logits, rtol=5e-2, atol=5e-2)
    assert (got.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.95


def test_convert_xverse(tmp_path):
    """Xverse is a pure arch-name remap onto the llama weight schema —
    converts and matches the HF llama forward (completes 13/13 converter
    classes under test)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    lcfg = LlamaConfig(hidden_size=48, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=4, vocab_size=268,
                       max_position_embeddings=128, rms_norm_eps=1e-5,
                       rope_theta=10000.0, bos_token_id=1, eos_token_id=2,
                       tie_word_embeddings=False, attention_bias=False)
    torch.manual_seed(17)
    model = LlamaForCausalLM(lcfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items() if "inv_freq" not in k}

    from calm_tpu import container as C
    d = tmp_path
    C.write_tensors(str(d / "model.safetensors"), sd, {})
    cfg_json = {"architectures": ["XverseForCausalLM"], "hidden_size": 48,
                "intermediate_size": 64, "num_hidden_layers": 2,
                "num_attention_heads": 4, "num_key_value_heads": 4,
                "vocab_size": 268, "max_position_embeddings": 128,
                "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
                "bos_token_id": 1, "eos_token_id": 2, "hidden_act": "silu"}
    with open(d / "config.json", "w") as f:
        json.dump(cfg_json, f)
    _mini_tokenizer_json(d, 268)

    out = str(d / "model.calm")
    convert_mod.main([out, str(d), "--dtype", "fp16"])

    tokens = [1, 10, 25, 199, 42]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].numpy()

    import jax.numpy as jnp
    from calm_tpu import model as M
    from calm_tpu.engine import Engine
    eng = Engine(out, context=32, kv_dtype="fp16")
    logits, _ = M.prefill(eng.cfg, eng.weights,
                          jnp.asarray([tokens], jnp.int32),
                          jnp.zeros((1,), jnp.int32), eng.cache,
                          logits_mode="all")
    got = np.asarray(logits[0], np.float32)
    np.testing.assert_allclose(got, hf_logits, rtol=5e-2, atol=5e-2)
