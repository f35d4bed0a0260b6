"""2:4 semi-structured sparse weight datapath (values + positions).

TPU-native replacement for the reference's sparse Marlin / magic_wand
kernels (csrc/quantization/marlin/sparse/marlin_24_cuda_kernel.cu,
vllm/model_executor/layers/quantization/gptq_marlin_24.py). TPUs have no
sparse MXU, so the win here is NOT skipped FLOPs — it is HBM bandwidth:
decode-time GEMMs are weight-streaming-bound, and a 2:4 checkpoint has
half the values to stream. Weights stay compressed in HBM (values at
quantized width + 4 bits of position metadata per quadruple), are expanded
to a dense tile on the VPU inside VMEM, and feed a dense MXU dot.

Storage layout (per linear, K = in_features, N = out_features):
  values: the 2 kept entries of each quadruple of 4 consecutive K rows.
    Per dense K-tile the rows are laid out [first-kept of each quad |
    second-kept of each quad] so in-kernel expansion needs only two
    contiguous half-slabs. Quantized: packed int4/int8 into int32 via
    ops.quant.pack_int_tiled (tile = k_tile // 2) -> [K//2//pf, N] int32.
    bf16 (sparse W16A16): [K//2, N] bf16, same row order.
  meta: one 4-bit code per quadruple: low 2 bits = position of the first
    kept element (0..3), high 2 bits = position of the second; packed like
    a 4-bit weight with tile k_tile // 4 (8 codes per word) ->
    [K//32, N] int32 (1 bit per logical weight).

In-kernel expansion is branch-free VPU select (no gather/scatter):
  dense[4q + d] = (p0[q] == d) ? v0[q] : 0  +  (p1[q] == d) ? v1[q] : 0
Pruned slots expand to exactly 0, so symmetric dequant needs the zero
point subtracted from the VALUES before expansion (a pruned weight must
dequantize to 0, not to -z*s) — the reference compresses (q - zp) for the
same reason (marlin_utils.py compress_quantized_24_weight).
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_magic_vllm_tpu.ops.quant import pack_int_tiled
from neural_magic_vllm_tpu.utils import round_up


def select_k_tile_24(k: int, group_size: int) -> int:
    """Dense-K tile for the sparse kernel. Needs k_tile//32 >= 8 packed
    meta sublanes -> k_tile >= 256."""
    gs = k if group_size in (-1, None) else group_size
    for kt in (512, 256):
        if k % kt == 0 and (kt % gs == 0 or gs % kt == 0 or gs >= k):
            return kt
    raise ValueError(f"no sparse-24 K tile for K={k}, group_size={group_size}"
                     " (K must be a multiple of 256)")


# --- host-side compression / packing (numpy, load time) ---------------------
def compress_24(dense: np.ndarray, prune_value: float
                ) -> Tuple[np.ndarray, np.ndarray]:
    """[K, N] -> (vals [K//4, 2, N], pos [K//4, 2, N]).

    Entries equal to ``prune_value`` count as pruned (for quantized levels
    that is the zero point; for bf16 weights, 0.0). Each quadruple of 4
    consecutive K rows must have at most 2 kept entries per column; the 2
    reported positions are the kept ones in ascending order, padded with
    arbitrary distinct positions whose value is ``prune_value`` (they
    expand to exactly 0, so the padding choice is numerically irrelevant).
    """
    K, N = dense.shape
    assert K % 4 == 0, K
    quads = dense.reshape(K // 4, 4, N)
    kept = quads != prune_value
    n_kept = kept.sum(axis=1)
    if (n_kept > 2).any():
        bad = int((n_kept > 2).sum())
        raise ValueError(f"weight is not 2:4 sparse: {bad} quadruples have "
                         ">2 non-zero entries")
    # stable argsort puts kept positions first, in ascending position order
    order = np.argsort(~kept, axis=1, kind="stable")  # [K//4, 4, N]
    pos = order[:, :2, :].astype(np.int32)
    vals = np.take_along_axis(quads, pos, axis=1)
    return vals, pos


def _tile_half_layout(pairs: np.ndarray, k_tile: int) -> np.ndarray:
    """[K//4, 2, N] quad-interleaved -> [K//2, N] with per-dense-tile rows
    [first-kept block | second-kept block]."""
    Kq, _, N = pairs.shape
    q_per_tile = k_tile // 4
    t = Kq // q_per_tile
    # [t, q, 2, N] -> [t, 2, q, N] -> [K//2, N]
    return pairs.reshape(t, q_per_tile, 2, N).transpose(0, 2, 1, 3).reshape(
        Kq * 2, N)


def pack_sparse24(vals: np.ndarray, pos: np.ndarray, bits: int,
                  k_tile: int) -> Tuple[np.ndarray, np.ndarray]:
    """Quantized variant: (vals, pos) from compress_24 (vals are unsigned
    levels) -> (vals_packed [K//2//pf, N] int32, meta [K//8, N] int32)."""
    vc = _tile_half_layout(vals.astype(np.uint32), k_tile)
    codes = (pos[:, 0] | (pos[:, 1] << 2)).astype(np.uint32)  # [K//4, N]
    return (pack_int_tiled(vc, bits, k_tile // 2),
            pack_int_tiled(codes, 4, k_tile // 4))


def pack_sparse24_bf16(dense: np.ndarray, k_tile: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """bf16 sparse W16A16 variant: [K, N] float weights with 2:4 zeros ->
    (vals [K//2, N] float32 — cast at device_put, meta [K//8, N] int32)."""
    vals, pos = compress_24(dense.astype(np.float32), 0.0)
    vc = _tile_half_layout(vals, k_tile)
    codes = (pos[:, 0] | (pos[:, 1] << 2)).astype(np.uint32)
    return vc, pack_int_tiled(codes, 4, k_tile // 4)


# --- jnp reference (golden for the Pallas kernel; CPU fallback path) --------
def _unpack_codes_jnp(meta: jax.Array, k_tile: int, k: int) -> jax.Array:
    """[K//8, N] int32 -> [K//4, N] 4-bit codes in dense quad order."""
    from neural_magic_vllm_tpu.ops.quant import unpack_int_tiled_jnp
    return unpack_int_tiled_jnp(meta, 4, k_tile // 4, k // 4).astype(
        jnp.int32)


def sparse24_expand_ref(vals_half: jax.Array, meta: jax.Array, k_tile: int,
                        k: int) -> jax.Array:
    """Expand ([K//2, N] signed values in tile-half layout, packed meta) ->
    [K, N] dense with zeros at pruned slots. ``vals_half`` is the already
    UNPACKED, already zero-point-subtracted value array."""
    N = vals_half.shape[1]
    codes = _unpack_codes_jnp(meta, k_tile, k)  # [K//4, N]
    t = k // k_tile
    q_per_tile = k_tile // 4
    halves = vals_half.reshape(t, 2, q_per_tile, N)
    v0 = halves[:, 0].reshape(k // 4, N)
    v1 = halves[:, 1].reshape(k // 4, N)
    p0 = codes & 3
    p1 = (codes >> 2) & 3
    parts = [
        jnp.where(p0 == d, v0, 0) + jnp.where(p1 == d, v1, 0)
        for d in range(4)
    ]
    return jnp.stack(parts, axis=1).reshape(k, N)


def sparse24_dequant_ref(vals_packed: jax.Array, meta: jax.Array,
                         scales: jax.Array, bits: int, k_tile: int, k: int,
                         group_size: int, out_dtype) -> jax.Array:
    """Packed quantized sparse -> [K, N] dense weights (golden path)."""
    from neural_magic_vllm_tpu.ops.quant import unpack_int_tiled_jnp
    levels = unpack_int_tiled_jnp(vals_packed, bits, k_tile // 2,
                                  k // 2).astype(jnp.float32)
    signed = levels - float(1 << (bits - 1))
    dense = sparse24_expand_ref(signed, meta, k_tile, k)
    G, N = scales.shape
    s = scales.astype(jnp.float32)
    if G == 1:
        w = dense * s
    else:
        gs = k if group_size in (-1, None) else group_size
        w = (dense.reshape(G, gs, N) * s.reshape(G, 1, N)).reshape(k, N)
    return w.astype(out_dtype)


def sparse24_matmul_ref(x: jax.Array, vals_packed: jax.Array,
                        meta: jax.Array, scales: jax.Array, bits: int,
                        k_tile: int, group_size: int,
                        bias: Optional[jax.Array] = None) -> jax.Array:
    k = x.shape[-1]
    w = sparse24_dequant_ref(vals_packed, meta, scales, bits, k_tile, k,
                             group_size, x.dtype)
    out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def sparse24_bf16_matmul_ref(x: jax.Array, vals: jax.Array, meta: jax.Array,
                             k_tile: int,
                             bias: Optional[jax.Array] = None) -> jax.Array:
    k = x.shape[-1]
    w = sparse24_expand_ref(vals.astype(jnp.float32), meta, k_tile,
                            k).astype(x.dtype)
    out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


# --- Pallas kernel ----------------------------------------------------------
def _make_sparse24_kernel(bits: Optional[int], k_tile: int,
                          groups_per_tile: int, n_k: int):
    """bits=None -> bf16 values (no scales); else quantized levels with
    per-group post-dot scaling (symmetric; zero point subtracted on the
    VALUES before expansion so pruned slots stay exactly 0)."""
    q_per_tile = k_tile // 4
    meta_stripe = q_per_tile // 8  # meta packed 4-bit: pf=8

    def kernel(x_ref, v_ref, m_ref, s_ref, o_ref, acc_ref):
        k_step = pl.program_id(2)

        @pl.when(k_step == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # unpack meta codes -> [q_per_tile, TN]
        qm = m_ref[:]  # [meta_stripe, TN] int32
        codes = jnp.concatenate(
            [(qm >> (4 * i)) & 0xF for i in range(8)], axis=0)
        p0 = codes & 3
        p1 = (codes >> 2) & 3

        if bits is None:
            vals = v_ref[:]  # [k_tile//2, TN] bf16
            v0 = vals[:q_per_tile]
            v1 = vals[q_per_tile:]
        else:
            mask = (1 << bits) - 1
            sym_zero = float(1 << (bits - 1))
            pf = 32 // bits
            stripe = (k_tile // 2) // pf
            qv = v_ref[:]  # [stripe, TN] int32
            # unpack to signed levels; integers |v| <= 2^(bits-1) are exact
            # in bf16, and pruned slots must expand to exactly 0
            slabs = [(((qv >> (bits * i)) & mask).astype(jnp.float32) -
                      sym_zero).astype(jnp.bfloat16) for i in range(pf)]
            vcat = slabs[0] if pf == 1 else jnp.concatenate(slabs, axis=0)
            v0 = vcat[:q_per_tile]
            v1 = vcat[q_per_tile:]

        zero = jnp.zeros((), v0.dtype)
        parts = [
            jnp.where(p0 == d, v0, zero) + jnp.where(p1 == d, v1, zero)
            for d in range(4)
        ]
        tn = v0.shape[1]
        w = jnp.stack(parts, axis=1).reshape(k_tile, tn)  # dense tile

        xf = x_ref[:]
        if bits is None:
            acc_ref[:] += jnp.dot(xf, w, preferred_element_type=jnp.float32)
        else:
            glen = k_tile // groups_per_tile
            for g in range(groups_per_tile):
                dot_acc = jnp.dot(xf[:, g * glen:(g + 1) * glen],
                                  w[g * glen:(g + 1) * glen],
                                  preferred_element_type=jnp.float32)
                acc_ref[:] += dot_acc * s_ref[0, g:g + 1, :]

        @pl.when(k_step == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("bits", "k_tile", "group_size",
                                             "tile_n"))
def sparse24_matmul_pallas(x: jax.Array, vals: jax.Array, meta: jax.Array,
                           scales: Optional[jax.Array], *,
                           bits: Optional[int], k_tile: int,
                           group_size: int,
                           bias: Optional[jax.Array] = None,
                           tile_n: int = 512) -> jax.Array:
    """x [.., K] @ 2:4-compressed weight -> [.., N].

    Quantized (bits in {4, 8}): vals [K//2//pf, N] int32, scales [G, N].
    bf16 (bits=None): vals [K//2, N] bf16, scales ignored.
    meta [K//32, N] int32 position codes (1 bit per logical weight).
    HBM weight traffic per step is K*N*bits/16 + K*N bits of metadata vs
    the dense kernel's K*N*bits/8.
    """
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1]).astype(jnp.bfloat16)
    M, K = x2.shape
    N = meta.shape[1]
    n_k = K // k_tile
    assert n_k * k_tile == K, (K, k_tile)
    gs = K if group_size in (-1, None) else group_size

    tile_m = min(256, round_up(M, 16))
    m_pad = round_up(M, tile_m)
    if m_pad != M:
        x2 = jnp.pad(x2, ((0, m_pad - M), (0, 0)))
    if N % tile_n == 0:
        tn = tile_n
    elif N % 128 == 0:
        tn = 128
    elif N <= 512:
        tn = N
    else:
        if bits is None:
            out = sparse24_bf16_matmul_ref(x2[:M], vals, meta, k_tile,
                                           bias=bias)
        else:
            out = sparse24_matmul_ref(x2[:M], vals, meta, scales, bits,
                                      k_tile, group_size, bias=bias)
        return out.astype(x.dtype).reshape(orig_shape[:-1] + (N, ))

    quantized = bits is not None
    if quantized:
        from neural_magic_vllm_tpu.ops.pallas_quant import _tile_groups
        gpt = k_tile // gs if gs <= k_tile else 1
        s_tiled = _tile_groups(scales.astype(jnp.float32), n_k, k_tile, gs,
                               K)
        gpt_pad = s_tiled.shape[1]
        pf = 32 // bits
        v_rows = (k_tile // 2) // pf
    else:
        gpt = 1
        s_tiled = jnp.zeros((n_k, 8, N), jnp.float32)  # unused dummy
        gpt_pad = 8
        v_rows = k_tile // 2

    kernel = _make_sparse24_kernel(bits, k_tile, gpt, n_k)
    interpret = jax.default_backend() not in ("tpu", "axon")
    w_bits = 16 if bits is None else bits
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // tile_m, N // tn, n_k),
        in_specs=[
            pl.BlockSpec((tile_m, k_tile), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v_rows, tn), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_tile // 32, tn), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpt_pad, tn), lambda m, n, k: (k, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * N * K,
            bytes_accessed=(m_pad * K * 2 + K * N * w_bits // 16 +
                            K * N // 8 + m_pad * N * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, vals, meta, s_tiled)

    out = out[:M]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype).reshape(orig_shape[:-1] + (N, ))
