"""Batched multi-LoRA application (the TPU answer to the reference's punica
bgmv kernels, csrc/punica/bgmv + vllm/lora/layers.py WithLoRA wrappers).

Two formulations, selected by slot count:

1. all-slots einsum (small S): the shrink projection runs for ALL slots
   (ranks are tiny, the MXU eats it), then each token selects its slot's
   intermediate — static shapes, no gathers of weight matrices:

     xa[t, s, r] = x[t, :] @ A[s, :, r]          (shrink, all slots)
     xa_sel[t, r] = xa[t, idx[t], r]             (per-token slot select)
     y[t, o] += (xa_sel[t, :] @ B[idx[t], :, o]) * scaling[idx[t]]

   Cost scales linearly with S in the shrink and materializes a
   [T, r, out] B-gather — cheap at S<=8, punica-unlike at dozens of slots.

2. grouped ragged_dot (large S): tokens sorted by slot, each slot's group
   contracts against only ITS adapter via jax.lax.ragged_dot — O(1) in S,
   the true bgmv analogue (same megablox formulation as ops/moe.py).

Slot 0 is the null adapter (zeros), so unadapted rows cost nothing extra.
The crossover defaults to S > 8 (override: NMV_TPU_LORA_GROUPED=0/1).
"""
import jax
import jax.numpy as jnp


def apply_lora_dense(x: jax.Array,  # [T, in]
                     a_stack: jax.Array,  # [S, r, in] (r-major: a minor
                     # dim of r=8..64 would cost an 8x-16x tile-padding
                     # blowup at rest on TPU — measured 3.6 GiB of pure
                     # padding at S=32 on the 8B model, lora_bench r4)
                     b_stack: jax.Array,  # [S, r, out]
                     scaling: jax.Array,  # [S]
                     lora_idx: jax.Array,  # [T] int32 (0 = none)
                     ) -> jax.Array:  # [T, out] delta
    S = a_stack.shape[0]
    xa = jnp.einsum("ti,sri->tsr", x.astype(jnp.float32),
                    a_stack.astype(jnp.float32))  # [T, S, r]
    onehot = jax.nn.one_hot(lora_idx, S, dtype=jnp.float32)  # [T, S]
    xa_sel = jnp.einsum("tsr,ts->tr", xa, onehot)
    b_sel = jnp.einsum("sro,ts->tro", b_stack.astype(jnp.float32), onehot)
    delta = jnp.einsum("tr,tro->to", xa_sel, b_sel)
    return (delta * jnp.take(scaling, lora_idx)[:, None]).astype(x.dtype)


def apply_lora_grouped(x: jax.Array,  # [T, in]
                       a_stack: jax.Array,  # [S, r, in]
                       b_stack: jax.Array,  # [S, r, out]
                       scaling: jax.Array,  # [S]
                       lora_idx: jax.Array,  # [T] int32 (0 = none)
                       ) -> jax.Array:  # [T, out] delta
    """bgmv-equivalent: sort tokens by slot, contract each slot group
    against only its own A/B via ragged_dot. FLOPs independent of the
    number of loaded adapters (reference punica O(1)-in-S contract,
    csrc/punica/bgmv/bgmv_impl.cuh)."""
    T = x.shape[0]
    S = a_stack.shape[0]
    order = jnp.argsort(lora_idx, stable=True)
    xs = x[order].astype(jnp.float32)
    group_sizes = jnp.zeros((S, ), jnp.int32).at[lora_idx].add(1)
    # ragged_dot wants rhs [g, k, n]; the transient [S, in, r] transpose
    # is tile-padded but per-call only (the resident stack stays r-major)
    xa = jax.lax.ragged_dot(xs,
                            jnp.swapaxes(a_stack, 1, 2).astype(jnp.float32),
                            group_sizes,
                            preferred_element_type=jnp.float32)  # [T, r]
    delta_s = jax.lax.ragged_dot(xa, b_stack.astype(jnp.float32),
                                 group_sizes,
                                 preferred_element_type=jnp.float32)
    delta_s = delta_s * jnp.take(scaling, lora_idx[order])[:, None]
    delta = jnp.zeros((T, delta_s.shape[1]), jnp.float32).at[order].set(
        delta_s)
    return delta.astype(x.dtype)


def apply_lora(x, a_stack, b_stack, scaling, lora_idx):
    from neural_magic_vllm_tpu import envs
    forced = envs.NMV_TPU_LORA_GROUPED
    S = a_stack.shape[0]
    if forced == "1" or (forced != "0" and S > 8):
        return apply_lora_grouped(x, a_stack, b_stack, scaling, lora_idx)
    return apply_lora_dense(x, a_stack, b_stack, scaling, lora_idx)
