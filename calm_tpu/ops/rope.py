"""Interleaved (complex-pair) RoPE with partial rotary dimension.

The container stores Q/K projections with HF's head permutation already
reversed (converter parity: tools/convert.py:224-239), so rotation acts on
interleaved pairs (v[2i], v[2i+1]) within each head, and pairs at offsets
>= rotary_dim are passed through unrotated (reference: src/infer.c:223-236).
"""

from __future__ import annotations

import jax.numpy as jnp


def _pair_angles(pos, head_dim: int, theta: float, rotary_dim: int):
    """Rotation angle per (position, pair). pos may be any-shaped int array."""
    j = jnp.arange(0, head_dim, 2, dtype=jnp.float32)  # offset of each pair
    freq = jnp.where(j < rotary_dim,
                     jnp.float32(1.0) / jnp.power(jnp.float32(theta), j / rotary_dim),
                     jnp.float32(0.0))
    pos = jnp.asarray(pos, dtype=jnp.float32)
    return pos[..., None] * freq  # (..., head_dim//2)


def rope_interleaved(v: jnp.ndarray, pos, theta: float, rotary_dim: int) -> jnp.ndarray:
    """Rotate v (..., n_heads, head_dim) by position(s) pos.

    pos broadcasts against v's batch dims: a scalar rotates everything by the
    same position; shape (...,) gives per-row positions (used both for decode
    steps and for batched prefill with a position vector).
    """
    head_dim = v.shape[-1]
    angles = _pair_angles(pos, head_dim, theta, rotary_dim)  # (..., hd//2)
    cos = jnp.cos(angles)[..., None, :]  # broadcast over heads axis
    sin = jnp.sin(angles)[..., None, :]

    vf = v.astype(jnp.float32).reshape(*v.shape[:-1], head_dim // 2, 2)
    v0, v1 = vf[..., 0], vf[..., 1]
    r0 = v0 * cos - v1 * sin
    r1 = v0 * sin + v1 * cos
    out = jnp.stack([r0, r1], axis=-1).reshape(v.shape)
    return out.astype(v.dtype)
