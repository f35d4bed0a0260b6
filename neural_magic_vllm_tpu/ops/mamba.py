"""Mamba (S6) selective-state-space mixer for Jamba-family models.

Capability parity with the reference's Jamba support
(vllm/model_executor/models/jamba.py: MambaMixer + its mamba_ssm /
causal_conv1d CUDA kernels), re-designed for TPU:
- the recurrence runs as ONE ``lax.scan`` over time inside the step
  executable (compile-once; decode is a single fused update step),
- the depthwise causal conv is unrolled over its (tiny, static) kernel
  width as shifted adds — XLA fuses it with the surrounding elementwise
  work; no conv kernel needed,
- per-sequence recurrent state (conv tail + SSM state) lives in
  preallocated slot arrays donated to every step (the reference's
  MambaCacheManager role) and is gathered/scattered by slot id with OOB
  slots dropped — padded batch rows never touch live state.

Weight layout (in-features-first, transposed from HF at load):
  in_proj  [H, 2*d_inner]        x_proj [d_inner, dt_rank + 2*d_state]
  dt_proj  [dt_rank, d_inner] (+bias)   out_proj [d_inner, H]
  conv_w   [d_conv, d_inner] (HF conv1d.weight [d_inner, 1, d_conv])
  A_log    [d_inner, d_state]    D [d_inner]
  dt_norm/b_norm/c_norm: RMSNorm weights (Jamba addition)
"""
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from neural_magic_vllm_tpu.layers.norm import rms_norm


def mamba_mixer_seq(p: Dict[str, Any], x: jax.Array,
                    conv_state: jax.Array, ssm_state: jax.Array,
                    *, d_state: int, dt_rank: int, d_conv: int,
                    eps: float = 1e-6
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One sequence chunk through the mixer.

    x [T, H]; conv_state [d_conv-1, d_inner] (trailing conv inputs);
    ssm_state [d_inner, d_state]. Returns (y [T, H], new_conv, new_ssm).
    Chunked prefill threads (conv_state, ssm_state) between chunks; fresh
    prefills pass zeros. Decode is T == 1.
    """
    T = x.shape[0]
    xz = jnp.dot(x, p["in_proj"])  # [T, 2*d_inner]
    d_inner = xz.shape[1] // 2
    xs, z = xz[:, :d_inner], xz[:, d_inner:]

    # depthwise causal conv over time, kernel width d_conv (static unroll)
    full = jnp.concatenate([conv_state.astype(xs.dtype), xs], axis=0)
    # full [d_conv-1+T, d_inner]; y[t] = sum_k w[k] * full[t+k] + b
    conv = p["conv_b"]
    for k in range(d_conv):
        conv = conv + p["conv_w"][k] * jax.lax.dynamic_slice_in_dim(
            full, k, T, axis=0)
    new_conv = full[-(d_conv - 1):] if d_conv > 1 else full[:0]
    xs = jax.nn.silu(conv)

    dbc = jnp.dot(xs, p["x_proj"])  # [T, dt_rank + 2*d_state]
    dt = rms_norm(dbc[:, :dt_rank], p["dt_norm"], eps)
    B = rms_norm(dbc[:, dt_rank:dt_rank + d_state], p["b_norm"], eps)
    C = rms_norm(dbc[:, dt_rank + d_state:], p["c_norm"], eps)
    dt = jax.nn.softplus(jnp.dot(dt, p["dt_proj"]) +
                         p["dt_proj_b"])  # [T, d_inner]

    A = -jnp.exp(p["A_log"].astype(jnp.float32))  # [d_inner, d_state]

    def step(h, ins):
        dt_t, b_t, c_t, x_t = ins
        dA = jnp.exp(dt_t[:, None] * A)  # [d_inner, d_state]
        dBx = (dt_t * x_t)[:, None] * b_t[None, :]
        h = dA * h + dBx
        y_t = jnp.sum(h * c_t[None, :], axis=-1)  # [d_inner]
        return h, y_t

    xs_f = xs.astype(jnp.float32)
    h0 = ssm_state.astype(jnp.float32)
    new_ssm, ys = jax.lax.scan(
        step, h0, (dt.astype(jnp.float32), B.astype(jnp.float32),
                   C.astype(jnp.float32), xs_f))
    ys = ys + xs_f * p["D"].astype(jnp.float32)[None, :]
    y = ys.astype(x.dtype) * jax.nn.silu(z)
    return jnp.dot(y, p["out_proj"]), new_conv, new_ssm.astype(
        ssm_state.dtype)


def mamba_mixer_decode(p: Dict[str, Any], x: jax.Array,
                       conv_state: jax.Array, ssm_state: jax.Array,
                       *, d_state: int, dt_rank: int, d_conv: int,
                       eps: float = 1e-6):
    """Batched single-token step: x [B, H]; conv_state [B, d_conv-1,
    d_inner]; ssm_state [B, d_inner, d_state]."""

    def one(x_row, cs, ss):
        y, nc, ns = mamba_mixer_seq(p, x_row[None, :], cs, ss,
                                    d_state=d_state, dt_rank=dt_rank,
                                    d_conv=d_conv, eps=eps)
        return y[0], nc, ns

    return jax.vmap(one, in_axes=(0, 0, 0))(x, conv_state, ssm_state)
