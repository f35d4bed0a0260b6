"""Core quantized-weight math: packing, dequant, and reference matmuls.

TPU-native replacement for the reference's quantization kernel zoo
(csrc/quantization/gptq_marlin/gptq_marlin.cu, csrc/quantization/fp8/common.cu,
csrc/quantization/compressed_tensors/int8_quant_kernels.cu). Where Marlin
designs its weight layout around 16x16 tensor-core tiles, ours is designed
around the MXU/VPU: weights are packed **K-tile-locally** so a Pallas kernel
can unpack one contiguous [KT/pack, N] int32 block into a sequential
[KT, N] tile with a lane-preserving concatenate (no shuffles).

Packed layout (``pack_int_tiled``):
  for K-tile t (KT rows), packed row r in [0, KT/pf), nibble/byte slot i:
    qweight[t*KT/pf + r, n] bits [w*i : w*i+w] = q[t*KT + i*(KT/pf) + r, n]
  (w = bits, pf = 32//bits). Unpacking slot i yields the i-th KT/pf-row
  stripe of the tile, so ``concatenate([slot_0..slot_{pf-1}], axis=0)``
  reconstructs rows t*KT..t*KT+KT **in order**.

All quantities are stored unsigned (0..2^bits-1) with per-group zero points
(symmetric schemes use z = 2^(bits-1)); dequant is (q - z) * scale, matching
the GPTQ/AWQ convention the reference kernels implement.
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_FP8_MAX = 448.0  # float8_e4m3fn finite max
_INT8_MAX = 127.0


def select_k_tile(k: int, group_size: int, bits: int = 4) -> int:
    """Largest hardware-friendly K-tile that divides K and is a multiple of
    the quantization group size (so per-tile scales are a contiguous slice).
    Minimum is 8 packed sublanes: kt >= 8 * (32 // bits)."""
    gs = k if group_size in (-1, None) else group_size
    min_kt = 8 * (32 // bits)
    for kt in (512, 256, 128, 64, 32):
        if kt < min_kt:
            break
        if k % kt == 0 and (kt % gs == 0 or gs % kt == 0 or gs >= k):
            return kt
    raise ValueError(f"no valid K tile for K={k}, group_size={group_size}")


# --- host-side packing (numpy; runs at load/repack time) --------------------
def pack_int_tiled(q: np.ndarray, bits: int, k_tile: int) -> np.ndarray:
    """[K, N] unsigned ints -> [K//pf, N] int32, K-tile-local strided packing
    (see module docstring). Host-side analogue of the reference's Marlin
    repack (csrc/quantization/gptq_marlin/gptq_marlin_repack.cu) for the MXU
    layout."""
    K, N = q.shape
    pf = 32 // bits
    assert K % k_tile == 0 and k_tile % pf == 0, (K, k_tile, pf)
    stripe = k_tile // pf
    # [T, pf, stripe, N]: tile t, slot i, packed row r
    qt = q.reshape(K // k_tile, pf, stripe, N).astype(np.uint32)
    out = np.zeros((K // k_tile, stripe, N), np.uint32)
    for i in range(pf):
        out |= (qt[:, i] & ((1 << bits) - 1)) << (bits * i)
    return out.reshape(K // pf, N).astype(np.int32)


def unpack_int_tiled(qweight: np.ndarray, bits: int, k_tile: int,
                     k: int) -> np.ndarray:
    """Inverse of pack_int_tiled (host-side, for tests/debug)."""
    pf = 32 // bits
    N = qweight.shape[1]
    stripe = k_tile // pf
    qw = qweight.view(np.uint32).reshape(k // k_tile, stripe, N)
    out = np.zeros((k // k_tile, pf, stripe, N), np.uint32)
    for i in range(pf):
        out[:, i] = (qw >> (bits * i)) & ((1 << bits) - 1)
    return out.reshape(k, N)


# --- in-graph unpack + dequant (jnp; golden for the Pallas kernel) ----------
def unpack_int_tiled_jnp(qweight: jax.Array, bits: int, k_tile: int,
                         k: int) -> jax.Array:
    pf = 32 // bits
    N = qweight.shape[1]
    stripe = k_tile // pf
    qw = qweight.astype(jnp.uint32).reshape(k // k_tile, stripe, N)
    slots = [(qw >> (bits * i)) & ((1 << bits) - 1) for i in range(pf)]
    return jnp.concatenate(slots, axis=1).reshape(k, N)


def dequant_weight(qweight: jax.Array, scales: jax.Array,
                   zeros: Optional[jax.Array], bits: int, k_tile: int,
                   k: int, group_size: int, out_dtype) -> jax.Array:
    """[K//pf, N] packed + [G, N] scales (+ optional [G, N] zeros) ->
    [K, N] dense. Symmetric default zero = 2^(bits-1)."""
    q = unpack_int_tiled_jnp(qweight, bits, k_tile, k).astype(jnp.float32)
    gs = k if group_size in (-1, None) else group_size
    G, N = scales.shape
    z = zeros.astype(jnp.float32) if zeros is not None else \
        jnp.float32(1 << (bits - 1))
    s = scales.astype(jnp.float32)
    if G == 1:
        w = (q - z) * s
    else:
        w = ((q.reshape(G, gs, N) -
              (z.reshape(G, 1, N) if zeros is not None else z)) *
             s.reshape(G, 1, N)).reshape(k, N)
    return w.astype(out_dtype)


def quant_matmul_ref(x: jax.Array, qweight: jax.Array, scales: jax.Array,
                     zeros: Optional[jax.Array], bits: int, k_tile: int,
                     group_size: int, bias: Optional[jax.Array] = None
                     ) -> jax.Array:
    """Reference WxA16 grouped matmul: dequantize then dot. The Pallas fused
    kernel (ops/pallas_quant.py) implements this same contract without
    materializing the dense weight in HBM."""
    k = x.shape[-1]
    w = dequant_weight(qweight, scales, zeros, bits, k_tile, k, group_size,
                       x.dtype)
    out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


# --- activation quantization (fp8 / int8 W8A8) -------------------------------
def scaled_fp8_quant(x: jax.Array, scale: Optional[jax.Array] = None
                     ) -> Tuple[jax.Array, jax.Array]:
    """Dynamic (scale=None) or static per-tensor fp8-e4m3 quantization
    (reference csrc/quantization/fp8/common.cu scaled_fp8_quant)."""
    if scale is None:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = jnp.maximum(amax, 1e-12) / _FP8_MAX
    xq = jnp.clip(x.astype(jnp.float32) / scale, -_FP8_MAX, _FP8_MAX)
    return xq.astype(jnp.float8_e4m3fn), scale


def scaled_int8_quant(x: jax.Array, scale: Optional[jax.Array] = None
                      ) -> Tuple[jax.Array, jax.Array]:
    """Dynamic/static per-tensor int8 activation quantization (reference
    int8_quant_kernels.cu)."""
    if scale is None:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = jnp.maximum(amax, 1e-12) / _INT8_MAX
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127)
    return xq.astype(jnp.int8), scale


def fp8_scaled_mm(x: jax.Array, w_fp8: jax.Array, w_scale: jax.Array,
                  act_scale: Optional[jax.Array] = None,
                  bias: Optional[jax.Array] = None,
                  out_dtype=jnp.bfloat16) -> jax.Array:
    """FP8 W8A8 matmul with per-tensor scales (reference cutlass_scaled_mm /
    torch._scaled_mm path, fp8.py:349-377). XLA keeps the fp8 weight in HBM
    and fuses the upconvert into the matmul."""
    xq, a_s = scaled_fp8_quant(x, act_scale)
    out = jnp.dot(xq.astype(jnp.bfloat16), w_fp8.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    out = out * (a_s * w_scale)
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


def int8_scaled_mm(x: jax.Array, w_int8: jax.Array, w_scale: jax.Array,
                   act_scale: Optional[jax.Array] = None,
                   bias: Optional[jax.Array] = None,
                   out_dtype=jnp.bfloat16) -> jax.Array:
    """INT8 W8A8 with int32 accumulation on the MXU (reference
    cutlass w8a8, scaled_mm_c2x.cu). w_scale may be per-tensor () or
    per-output-channel [N]."""
    xq, a_s = scaled_int8_quant(x, act_scale)
    out = jax.lax.dot_general(xq, w_int8, (((1, ), (0, )), ((), ())),
                              preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * (a_s * w_scale)
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)
