"""Rotary position embeddings.

TPU-native equivalent of the reference RotaryEmbedding family
(vllm/model_executor/layers/rotary_embedding.py:60-726). The fused CUDA op is
unnecessary here: cos/sin are computed in-graph from positions and XLA fuses
the elementwise rotation into surrounding ops. NeoX style (rotate halves) and
GPT-J style (rotate pairs) are both supported, plus linear / dynamic-NTK /
YaRN scaling.
"""
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _compute_inv_freq(head_dim: int, rotary_dim: int, base: float):
    exponent = jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim
    return 1.0 / (base**exponent)


def _yarn_find_correction_dim(num_rotations, dim, base, max_pos):
    return (dim * math.log(max_pos / (num_rotations * 2 * math.pi))) / \
        (2 * math.log(base))


def _yarn_find_correction_range(low_rot, high_rot, dim, base, max_pos):
    low = math.floor(_yarn_find_correction_dim(low_rot, dim, base, max_pos))
    high = math.ceil(_yarn_find_correction_dim(high_rot, dim, base, max_pos))
    return max(low, 0), min(high, dim - 1)


def _yarn_linear_ramp_mask(low, high, dim):
    if low == high:
        high += 0.001
    ramp = (jnp.arange(dim, dtype=jnp.float32) - low) / (high - low)
    return jnp.clip(ramp, 0, 1)


class RotaryEmbedding:
    """Stateless RoPE: precomputes inv_freq (+ scaling), applies per call.

    is_neox_style=True rotates [x1|x2] halves (llama/qwen/gemma);
    False rotates interleaved pairs (gpt-j).
    """

    def __init__(
        self,
        head_dim: int,
        rotary_dim: Optional[int] = None,
        max_position: int = 2048,
        base: float = 10000.0,
        is_neox_style: bool = True,
        scaling: Optional[dict] = None,
    ) -> None:
        self.head_dim = head_dim
        self.rotary_dim = rotary_dim or head_dim
        self.base = base
        self.is_neox_style = is_neox_style
        self.max_position = max_position
        self.mscale = 1.0

        inv_freq = _compute_inv_freq(head_dim, self.rotary_dim, base)
        if scaling:
            rope_type = scaling.get("rope_type", scaling.get("type"))
            factor = float(scaling.get("factor", 1.0))
            if rope_type == "linear":
                inv_freq = inv_freq / factor
            elif rope_type == "dynamic":
                # Dynamic NTK with the max-length alpha (static shapes force
                # the worst-case alpha; reference rotary_embedding.py:351).
                alpha = factor
                base = base * alpha**(self.rotary_dim /
                                      (self.rotary_dim - 2))
                inv_freq = _compute_inv_freq(head_dim, self.rotary_dim, base)
            elif rope_type == "yarn":
                orig_max = int(
                    scaling.get("original_max_position_embeddings", 4096))
                beta_fast = scaling.get("beta_fast", 32)
                beta_slow = scaling.get("beta_slow", 1)
                extrapolation = _compute_inv_freq(head_dim, self.rotary_dim,
                                                  base)
                interpolation = extrapolation / factor
                low, high = _yarn_find_correction_range(
                    beta_fast, beta_slow, self.rotary_dim, base, orig_max)
                mask = 1.0 - _yarn_linear_ramp_mask(low, high,
                                                    self.rotary_dim // 2)
                inv_freq = interpolation * (1 - mask) + extrapolation * mask
                attn_factor = scaling.get("attn_factor", 1.0)
                self.mscale = float(
                    (0.1 * math.log(factor) + 1.0) * attn_factor) \
                    if factor > 1 else 1.0
            elif rope_type in ("longrope", "su"):
                # Phi3LongRoPE (reference rotary_embedding.py:432): per-dim
                # rescale factors; static shapes force the long factors
                # (worst case) whenever serving beyond the original window.
                orig_max = int(
                    scaling.get("original_max_position_embeddings",
                                max_position))
                factors = scaling["long_factor"] if max_position > orig_max \
                    else scaling["short_factor"]
                import numpy as _np
                inv_freq = inv_freq / jnp.asarray(
                    _np.asarray(factors, _np.float32))
                if max_position > orig_max:
                    self.mscale = math.sqrt(
                        1.0 + math.log(max_position / orig_max) /
                        math.log(orig_max))
            elif rope_type in ("llama3", ):
                low_freq_factor = scaling.get("low_freq_factor", 1.0)
                high_freq_factor = scaling.get("high_freq_factor", 4.0)
                orig_max = scaling.get(
                    "original_max_position_embeddings", 8192)
                wavelen = 2 * math.pi / inv_freq
                low_wl = orig_max / low_freq_factor
                high_wl = orig_max / high_freq_factor
                smooth = (orig_max / wavelen - low_freq_factor) / (
                    high_freq_factor - low_freq_factor)
                new_freq = jnp.where(
                    wavelen < high_wl, inv_freq,
                    jnp.where(wavelen > low_wl, inv_freq / factor,
                              (1 - smooth) * inv_freq / factor +
                              smooth * inv_freq))
                inv_freq = new_freq
        self.inv_freq = inv_freq

    def precompute(self, positions: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
        """positions [T] -> (cos, sin) [T, rd/2]; computed once per step and
        reused by every layer (the layers run under lax.scan)."""
        freqs = positions.astype(jnp.float32)[:, None] * \
            self.inv_freq[None, :]
        return jnp.cos(freqs) * self.mscale, jnp.sin(freqs) * self.mscale

    def __call__(self, positions: jax.Array, q: jax.Array,
                 k: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """positions: [T]; q: [T, nqh, hd]; k: [T, kvh, hd]."""
        cos, sin = self.precompute(positions)
        return self.apply(cos, sin, q, k)

    def apply(self, cos: jax.Array, sin: jax.Array, q: jax.Array,
              k: jax.Array) -> Tuple[jax.Array, jax.Array]:

        def rotate(x):
            dtype = x.dtype
            rd = self.rotary_dim
            x_rot, x_pass = x[..., :rd], x[..., rd:]
            xf = x_rot.astype(jnp.float32)
            if self.is_neox_style:
                x1, x2 = xf[..., :rd // 2], xf[..., rd // 2:]
                c = cos[:, None, :]
                s = sin[:, None, :]
                o1 = x1 * c - x2 * s
                o2 = x2 * c + x1 * s
                rotated = jnp.concatenate([o1, o2], axis=-1)
            else:
                x1, x2 = xf[..., 0::2], xf[..., 1::2]
                c = cos[:, None, :]
                s = sin[:, None, :]
                o1 = x1 * c - x2 * s
                o2 = x2 * c + x1 * s
                rotated = jnp.stack([o1, o2], axis=-1).reshape(xf.shape)
            if x_pass.shape[-1]:
                return jnp.concatenate([rotated.astype(dtype), x_pass],
                                       axis=-1)
            return rotated.astype(dtype)

        return rotate(q), rotate(k)


def get_rope(head_dim: int,
             rotary_dim: Optional[int],
             max_position: int,
             base: float,
             is_neox_style: bool = True,
             rope_scaling: Optional[dict] = None) -> RotaryEmbedding:
    return RotaryEmbedding(head_dim, rotary_dim, max_position, base,
                           is_neox_style, rope_scaling)
