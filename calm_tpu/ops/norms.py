"""Normalization: RMSNorm, LayerNorm (no bias), shared epsilon-inside-sqrt
semantics (reference: src/infer.c:183-207 — LayerNorm is RMSNorm with the
mean subtracted first; neither variant has a bias term)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rmsnorm(x: jnp.ndarray, weight: jnp.ndarray, eps: float,
            subtract_mean: bool = False) -> jnp.ndarray:
    """Normalize the last axis and scale by weight.

    subtract_mean=True gives bias-free LayerNorm (norm_type=layernorm*).
    Computation in float32 regardless of input dtype.
    """
    xf = x.astype(jnp.float32)
    if subtract_mean:
        xf = xf - jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)
