"""Normalization layers. XLA fuses these into surrounding elementwise ops,
replacing the reference's fused CUDA kernels (csrc/layernorm_kernels.cu)."""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6,
             weight_offset: float = 0.0) -> jax.Array:
    """RMSNorm in fp32 accumulation. weight_offset=1.0 gives the Gemma
    convention ((1 + w) * normed)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    out = normed * (weight.astype(jnp.float32) + weight_offset)
    return out.astype(dtype)


def fused_add_rms_norm(
        x: jax.Array, residual: jax.Array, weight: jax.Array,
        eps: float = 1e-6,
        weight_offset: float = 0.0) -> Tuple[jax.Array, jax.Array]:
    """residual-add + RMSNorm, returning (normed, new_residual) — the
    contract of the reference fused_add_rms_norm op."""
    residual = residual + x
    return rms_norm(residual, weight, eps, weight_offset), residual


def layer_norm(x: jax.Array, weight: jax.Array, bias: Optional[jax.Array],
               eps: float = 1e-5) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
