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


def rope_tables(pos, head_dim: int, theta: float, rotary_dim: int):
    """(cos, sin) tables for positions pos, shape pos.shape + (hd//2,).

    Computed once per forward step and reused by every layer (the tables
    depend only on pos, not on the layer — recomputing the transcendentals
    inside the layer scan costs ~0.7 ms/token on a 32-layer model)."""
    angles = _pair_angles(pos, head_dim, theta, rotary_dim)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(v: jnp.ndarray, cos, sin) -> jnp.ndarray:
    """Rotate v (..., n_heads, head_dim) by precomputed tables
    (cos/sin shaped v.shape[:-2] + (head_dim//2,))."""
    head_dim = v.shape[-1]
    c = cos[..., None, :]  # broadcast over heads axis
    s = sin[..., None, :]
    vf = v.astype(jnp.float32).reshape(*v.shape[:-1], head_dim // 2, 2)
    v0, v1 = vf[..., 0], vf[..., 1]
    r0 = v0 * c - v1 * s
    r1 = v0 * s + v1 * c
    out = jnp.stack([r0, r1], axis=-1).reshape(v.shape)
    return out.astype(v.dtype)


def rope_interleaved(v: jnp.ndarray, pos, theta: float, rotary_dim: int) -> jnp.ndarray:
    """Rotate v (..., n_heads, head_dim) by position(s) pos.

    pos broadcasts against v's batch dims: a scalar rotates everything by the
    same position; shape (...,) gives per-row positions (used both for decode
    steps and for batched prefill with a position vector).
    """
    head_dim = v.shape[-1]
    cos, sin = rope_tables(pos, head_dim, theta, rotary_dim)
    return apply_rope(v, cos, sin)
