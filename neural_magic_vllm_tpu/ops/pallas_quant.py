"""Pallas fused dequant-GEMM: WxA16 grouped-quantized matmul on the MXU.

The TPU-native analogue of the reference's Marlin kernel
(csrc/quantization/gptq_marlin/gptq_marlin.cu): the packed int4/int8 weight
is streamed from HBM at its quantized width (0.5 / 1 byte per weight),
unpacked and dequantized on the VPU inside VMEM, and fed to the MXU —
the dense bf16 weight never exists in HBM. Marlin's 16x16 tensor-core tile
layout is replaced by the K-tile-local strided packing of ops/quant.py,
chosen so unpacking slot i of the int32 word yields the i-th contiguous
row-stripe of the K-tile: reconstruction is a lane-preserving concatenate,
no cross-lane shuffles.

Grid: (M/TM, N/TN, K/KT) with K innermost; a VMEM f32 accumulator carries
partial sums across K steps (the Pallas reduction-dim pattern, standing in
for Marlin's split-K workspace machinery).
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_magic_vllm_tpu.utils import round_up


def _make_kernel_fast(bits: int, k_tile: int, groups_per_tile: int,
                      n_k: int, has_zeros: bool):
    """Fast path (requires gs % stripe == 0, i.e. every packed slot falls in
    ONE quantization group): per-slot dots on the RAW unpacked ints (exact in
    bf16 since q < 2^bits), then one post-dot scale per group and the
    zero-point folded out algebraically:
        s * (x @ (q - z)) = s * (x @ q) - s * z * rowsum(x)
    This keeps per-weight VPU work to unpack+convert (~3 ops) and moves the
    scale/zero math to [M, TN]-sized tensors."""
    pf = 32 // bits
    mask = (1 << bits) - 1
    sym_zero = float(1 << (bits - 1))
    stripe = k_tile // pf
    slots_per_group = pf // groups_per_tile  # >= 1 by fast-path precondition

    def kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref):
        k_step = pl.program_id(2)

        @pl.when(k_step == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        qw = qw_ref[:]  # [stripe, TN] int32
        xf = x_ref[:]
        glen = slots_per_group * stripe  # quant-group K extent
        for g in range(groups_per_tile):
            # one MXU dot per GROUP: consecutive slots are consecutive
            # K-stripes, so their unpacked rows concatenate into the
            # group's contiguous [glen, TN] weight slab (deeper contraction
            # feeds the 128-deep MXU far better than per-slot K=stripe dots)
            slabs = [
                ((qw >> (bits * i)) & mask).astype(jnp.float32).astype(
                    jnp.bfloat16)  # exact: q < 2^bits
                for i in range(g * slots_per_group,
                               (g + 1) * slots_per_group)
            ]
            qcat = slabs[0] if len(slabs) == 1 else jnp.concatenate(
                slabs, axis=0)
            x_g = xf[:, g * glen:(g + 1) * glen]
            dot_acc = jnp.dot(x_g, qcat, preferred_element_type=jnp.float32)
            rs_acc = jnp.sum(x_g.astype(jnp.float32), axis=1, keepdims=True)
            s_row = s_ref[0, g:g + 1, :]  # [1, TN] f32
            if has_zeros:
                z_row = z_ref[0, g:g + 1, :]
                acc_ref[:] += (dot_acc - rs_acc * z_row) * s_row
            else:
                acc_ref[:] += (dot_acc - rs_acc * sym_zero) * s_row

        @pl.when(k_step == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def _make_kernel_w4a8(bits: int, k_tile: int, groups_per_tile: int,
                      n_k: int, has_zeros: bool):
    """W4A8 fast path: activations arrive pre-quantized to int8 (per-row
    dynamic symmetric scale applied OUTSIDE the kernel, so it factors out
    of both the dot and the rowsum), and the per-group dots run as native
    int8 x int8 -> int32 MXU contractions — 2x the bf16 MXU rate on real
    TPU hardware (394 vs 197 TOPS on v5e). Same zero-point fold as the
    bf16 fast path, done in integer space:
        s * (x8 @ (q - z)) = s * (x8 @ q) - s * z * rowsum(x8)
    Reference role: Marlin QQQ / cutlass w8a8 int8 epilogues
    (csrc/quantization/cutlass_w8a8)."""
    pf = 32 // bits
    mask = (1 << bits) - 1
    sym_zero = float(1 << (bits - 1))
    stripe = k_tile // pf
    slots_per_group = pf // groups_per_tile

    def kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref):
        k_step = pl.program_id(2)

        @pl.when(k_step == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        qw = qw_ref[:]  # [stripe, TN] int32
        x8 = x_ref[:]   # [TM, KT] int8
        glen = slots_per_group * stripe
        for g in range(groups_per_tile):
            slabs = [
                ((qw >> (bits * i)) & mask).astype(jnp.int8)
                for i in range(g * slots_per_group,
                               (g + 1) * slots_per_group)
            ]
            qcat = slabs[0] if len(slabs) == 1 else jnp.concatenate(
                slabs, axis=0)  # [glen, TN] int8, values < 2^bits
            x_g = x8[:, g * glen:(g + 1) * glen]
            dot_i32 = jnp.dot(x_g, qcat,
                              preferred_element_type=jnp.int32)
            rs_i32 = jnp.sum(x_g.astype(jnp.int32), axis=1, keepdims=True)
            s_row = s_ref[0, g:g + 1, :]  # [1, TN] f32
            dot_f = dot_i32.astype(jnp.float32)
            rs_f = rs_i32.astype(jnp.float32)
            if has_zeros:
                z_row = z_ref[0, g:g + 1, :]
                acc_ref[:] += (dot_f - rs_f * z_row) * s_row
            else:
                acc_ref[:] += (dot_f - rs_f * sym_zero) * s_row

        @pl.when(k_step == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def _make_grouped_kernel_fast(bits: int, k_tile: int, groups_per_tile: int,
                              n_k: int, has_zeros: bool):
    """Grouped (MoE) variant of the fast kernel: the m-tile's expert is
    resolved by the BlockSpec index maps from the prefetched expert-of-tile
    scalar array, so weight/scale blocks arrive with a leading singleton
    expert axis. Same per-group dot + algebraic zero-point fold as
    _make_kernel_fast."""
    pf = 32 // bits
    mask = (1 << bits) - 1
    sym_zero = float(1 << (bits - 1))
    stripe = k_tile // pf
    slots_per_group = pf // groups_per_tile

    def kernel(e_ref, x_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref):
        del e_ref  # consumed by the index maps
        k_step = pl.program_id(2)

        @pl.when(k_step == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        qw = qw_ref[0]  # [stripe, TN] int32
        xf = x_ref[:]
        glen = slots_per_group * stripe
        for g in range(groups_per_tile):
            slabs = [
                ((qw >> (bits * i)) & mask).astype(jnp.float32).astype(
                    jnp.bfloat16)
                for i in range(g * slots_per_group,
                               (g + 1) * slots_per_group)
            ]
            qcat = slabs[0] if len(slabs) == 1 else jnp.concatenate(
                slabs, axis=0)
            x_g = xf[:, g * glen:(g + 1) * glen]
            dot_acc = jnp.dot(x_g, qcat, preferred_element_type=jnp.float32)
            rs_acc = jnp.sum(x_g.astype(jnp.float32), axis=1, keepdims=True)
            s_row = s_ref[0, 0, g:g + 1, :]  # [1, TN] f32
            if has_zeros:
                z_row = z_ref[0, 0, g:g + 1, :]
                acc_ref[:] += (dot_acc - rs_acc * z_row) * s_row
            else:
                acc_ref[:] += (dot_acc - rs_acc * sym_zero) * s_row

        @pl.when(k_step == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("bits", "k_tile", "group_size",
                                             "tile_m", "tile_n"))
def quant_grouped_matmul_pallas(x_al: jax.Array, expert_of_tile: jax.Array,
                                qweight: jax.Array, scales: jax.Array,
                                zeros: Optional[jax.Array] = None, *,
                                bits: int, k_tile: int, group_size: int,
                                tile_m: int = 128,
                                tile_n: int = 512) -> jax.Array:
    """Grouped WxA16 dequant-GEMM for MoE expert stacks (the megablox gmm
    role; reference anchor: the Marlin-tiled fused_moe block-GEMM pipeline,
    vllm/model_executor/layers/fused_moe/fused_moe.py:402-527).

    x_al [M_pad, K] bf16 — token replicas sorted by expert and ALIGNED so
    every tile_m row tile belongs to exactly one expert (the
    moe_align_block_size contract, fused_moe.py:166-221; padding rows are
    zero). expert_of_tile [M_pad//tile_m] i32 maps each row tile to its
    expert. qweight [E, K//pf, N] int32 (pack_int_tiled per expert),
    scales [E, G, N]. The packed weight streams from HBM at quantized
    width per tile — the dense expert tensor never exists in HBM (vs the
    dequant-then-ragged_dot fallback, which materializes it every step).
    """
    M_pad, K = x_al.shape
    E, _, N = qweight.shape
    G = scales.shape[1]
    gs = K if group_size in (-1, None) else group_size
    n_k = K // k_tile
    assert n_k * k_tile == K, (K, k_tile)
    assert M_pad % tile_m == 0, (M_pad, tile_m)
    pf = 32 // bits
    stripe = k_tile // pf
    # fast-path precondition (every packed slot inside one quant group)
    assert gs >= k_tile or (k_tile % gs == 0 and gs % stripe == 0), \
        (gs, k_tile, stripe)
    if N % tile_n == 0:
        tn = tile_n
    else:
        assert N % 128 == 0, N
        tn = 128

    gpt = k_tile // gs if gs <= k_tile else 1
    # per-expert tiled scales: [E, n_k, pad8(gpt), N]
    s_tiled = jax.vmap(lambda s: _tile_groups(s.astype(jnp.float32), n_k,
                                              k_tile, gs, K))(scales)
    gpt_pad = s_tiled.shape[2]
    has_zeros = zeros is not None
    if has_zeros:
        z_tiled = jax.vmap(lambda z: _tile_groups(z.astype(jnp.float32),
                                                  n_k, k_tile, gs, K))(zeros)
    else:
        z_tiled = jnp.zeros_like(s_tiled)

    kernel = _make_grouped_kernel_fast(bits, k_tile, gpt, n_k, has_zeros)
    s_spec = pl.BlockSpec((1, 1, gpt_pad, tn),
                          lambda m, n, k, e: (e[m], k, 0, n),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M_pad // tile_m, N // tn, n_k),
        in_specs=[
            pl.BlockSpec((tile_m, k_tile), lambda m, n, k, e: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_tile // pf, tn),
                         lambda m, n, k, e: (e[m], k, n),
                         memory_space=pltpu.VMEM),
            s_spec,
            s_spec,
        ],
        out_specs=pl.BlockSpec((tile_m, tn), lambda m, n, k, e: (m, n),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_m, tn), jnp.float32)],
    )
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, N), x_al.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M_pad * N * K,
            bytes_accessed=(M_pad * K * 2 +
                            (M_pad // tile_m) * K * N * bits // 8 +
                            M_pad * N * 2),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(expert_of_tile, x_al.astype(jnp.bfloat16), qweight, s_tiled, z_tiled)
    return out


def _make_kernel(bits: int, k_tile: int, groups_per_tile: int,
                 n_k: int, has_zeros: bool):
    pf = 32 // bits
    mask = (1 << bits) - 1
    sym_zero = float(1 << (bits - 1))

    def kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref):
        k_step = pl.program_id(2)

        @pl.when(k_step == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        qw = qw_ref[:].astype(jnp.uint32)  # [KT//pf, TN]
        # (mosaic can't cast uint32->f32 directly; values are < 2^bits so
        # a bitcast-free int32 hop is exact)
        slots = [((qw >> (bits * i)) & mask).astype(jnp.int32).astype(
            jnp.float32) for i in range(pf)]
        q = jnp.concatenate(slots, axis=0)  # [KT, TN], rows in order
        tn = q.shape[1]
        # s_ref/z_ref blocks are [1, pad8(G_t), TN]; valid rows = G_t.
        s = s_ref[0, :groups_per_tile, :].astype(jnp.float32)
        if has_zeros:
            z = z_ref[0, :groups_per_tile, :].astype(jnp.float32)
        else:
            z = sym_zero
        if groups_per_tile == 1:
            w = (q - z) * s
        else:
            q3 = q.reshape(groups_per_tile, k_tile // groups_per_tile, tn)
            if has_zeros:
                z = z.reshape(groups_per_tile, 1, tn)
            w = ((q3 - z) * s.reshape(groups_per_tile, 1, tn)).reshape(
                k_tile, tn)
        acc_ref[:] += jnp.dot(x_ref[:], w.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)

        @pl.when(k_step == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def _tile_groups(arr: jax.Array, n_k: int, k_tile: int, gs: int,
                 K: int) -> jax.Array:
    """[G, N] per-group values -> [n_k, pad8(G_t), N] per-K-tile blocks
    (sublane-aligned for BlockSpec)."""
    G, N = arr.shape
    if gs <= k_tile:
        gpt = k_tile // gs
        tiled = arr.reshape(n_k, gpt, N)
    else:
        gpt = 1
        idx = (jnp.arange(n_k) * k_tile) // gs
        tiled = arr[idx][:, None, :]
    pad = max(8, gpt) - gpt
    if pad:
        tiled = jnp.pad(tiled, ((0, 0), (0, pad), (0, 0)))
    return tiled


@functools.partial(jax.jit, static_argnames=("bits", "k_tile", "group_size",
                                             "tile_n", "act_int8"))
def quant_matmul_pallas(x: jax.Array, qweight: jax.Array, scales: jax.Array,
                        zeros: Optional[jax.Array], *, bits: int,
                        k_tile: int, group_size: int,
                        bias: Optional[jax.Array] = None,
                        tile_n: int = 512,
                        act_int8: bool = False) -> jax.Array:
    """x [M, K] (bf16/f32) @ packed weight -> [M, N] in x.dtype.
    qweight [K//pf, N] int32 (pack_int_tiled layout), scales [G, N],
    zeros optional [G, N]. ``act_int8`` quantizes activations per-row to
    int8 and contracts in native int8 on the MXU (W4A8; opt-in via
    NMV_TPU_W4A8=1 — changes numerics, 2x MXU rate on real hardware)."""
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1])
    M, K = x2.shape
    N = qweight.shape[1]
    G = scales.shape[0]
    gs = K if group_size in (-1, None) else group_size
    n_k = K // k_tile
    assert n_k * k_tile == K, (K, k_tile)

    if N % tile_n != 0 and N % 128 != 0 and N > 512:
        # odd N: the XLA reference path handles it (weights are static, so
        # real models should be padded at pack time instead). Must run on
        # the ORIGINAL activations, before any int8 quantization.
        from neural_magic_vllm_tpu.ops.quant import quant_matmul_ref
        out = quant_matmul_ref(x2.astype(jnp.bfloat16), qweight, scales,
                               zeros, bits, k_tile, group_size, bias=bias)
        return out.astype(x.dtype).reshape(orig_shape[:-1] + (N, ))

    pf_chk = 32 // bits
    stripe_chk = k_tile // pf_chk
    gs_chk = K if group_size in (-1, None) else group_size
    # int8 MXU path is 4-bit only: the unpacked levels are cast to int8
    # inside the kernel, which would wrap 8-bit levels >= 128
    use_a8 = act_int8 and bits == 4 and (gs_chk >= k_tile or
                                         (k_tile % gs_chk == 0
                                          and gs_chk % stripe_chk == 0))
    if use_a8:
        # per-row dynamic symmetric int8 (the rowsum fold needs the scale
        # to factor out of the whole row, hence per-row not per-group)
        absmax = jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=1,
                         keepdims=True)
        a_scale = jnp.maximum(absmax, 1e-8) / 127.0
        x2 = jnp.clip(jnp.round(x2.astype(jnp.float32) / a_scale),
                      -127, 127).astype(jnp.int8)
    else:
        x2 = x2.astype(jnp.bfloat16)
    # int8 VMEM tiles are (32, 128): keep the M tile sublane-aligned
    tile_m = min(256, round_up(M, 32 if use_a8 else 16))
    m_pad = round_up(M, tile_m)
    if m_pad != M:
        x2 = jnp.pad(x2, ((0, m_pad - M), (0, 0)))
    if N % tile_n == 0:
        tn = tile_n
    elif N % 128 == 0:
        tn = 128
    else:
        tn = N  # N <= 512 (odd N bailed to the ref path above)

    gpt = k_tile // gs if gs <= k_tile else 1
    s_tiled = _tile_groups(scales.astype(jnp.float32), n_k, k_tile, gs, K)
    gpt_pad = s_tiled.shape[1]
    s_spec = pl.BlockSpec((1, gpt_pad, tn), lambda m, n, k: (k, 0, n),
                          memory_space=pltpu.VMEM)

    pf = 32 // bits
    has_zeros = zeros is not None
    stripe = k_tile // pf
    fast = gs >= k_tile or (k_tile % gs == 0 and gs % stripe == 0)
    if use_a8:
        make = _make_kernel_w4a8
    elif fast:
        make = _make_kernel_fast
    else:
        make = _make_kernel
    kernel = make(bits, k_tile, gpt, n_k, has_zeros)
    if has_zeros:
        z_tiled = _tile_groups(zeros.astype(jnp.float32), n_k, k_tile, gs,
                               K)
    else:
        z_tiled = jnp.zeros_like(s_tiled)  # unused dummy block

    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // tile_m, N // tn, n_k),
        in_specs=[
            pl.BlockSpec((tile_m, k_tile), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_tile // pf, tn), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            s_spec,
            s_spec,
        ],
        out_specs=pl.BlockSpec((tile_m, tn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * N * K,
            bytes_accessed=(m_pad * K * 2 + K * N * bits // 8 +
                            m_pad * N * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, qweight, s_tiled, z_tiled)

    out = out[:M]
    if use_a8:
        out = (out.astype(jnp.float32) * a_scale[:M]).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(orig_shape[:-1] + (N, ))
