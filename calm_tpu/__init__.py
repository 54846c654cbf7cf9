"""calm-tpu: a TPU-native single-batch-obsessed LLM inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of zeux/calm
(reference: /root/reference) for TPU hardware:

- one .calm safetensors container holding weights + tokenizer + hyperparameters
  (reference: src/tensors.c, tools/convert.py)
- fp16 / fp8-e5m2 / fp8e4 (e4m3 + per-tensor scale) / gf4 (4-bit
  group-float) weight-only quantization
  (reference: tools/convert.py:245-268, src/helpers.cuh:100-113)
- decode-bandwidth-first execution: one jitted step per token, fused
  dequant+matvec Pallas kernels, fp16-or-fp8 KV cache, attention sinks +
  rolling KV window (reference: src/infer.cu)
- NEW scope beyond the reference: tensor/expert parallelism over a
  jax.sharding.Mesh (ICI collectives), batched prefill, continuous batching.
"""

__version__ = "0.1.0"

from calm_tpu.config import ModelConfig  # noqa: F401
