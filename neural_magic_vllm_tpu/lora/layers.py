"""Batched multi-LoRA application (the TPU answer to the reference's punica
bgmv kernels, csrc/punica/bgmv + vllm/lora/layers.py WithLoRA wrappers).

Instead of a batched-gather GEMV kernel, the shrink projection runs for ALL
slots (ranks are tiny, the MXU eats it), then each token selects its slot's
intermediate — static shapes, no gathers of weight matrices:

  xa[t, s, r] = x[t, :] @ A[s, :, r]          (shrink, all slots)
  xa_sel[t, r] = xa[t, idx[t], r]             (per-token slot select)
  y[t, o] += (xa_sel[t, :] @ B[idx[t], :, o]) * scaling[idx[t]]

Slot 0 is the null adapter (zeros), so unadapted rows cost nothing extra.
"""
import jax
import jax.numpy as jnp


def apply_lora(x: jax.Array,  # [T, in]
               a_stack: jax.Array,  # [S, in, r]
               b_stack: jax.Array,  # [S, r, out]
               scaling: jax.Array,  # [S]
               lora_idx: jax.Array,  # [T] int32 (0 = none)
               ) -> jax.Array:  # [T, out] delta
    S = a_stack.shape[0]
    xa = jnp.einsum("ti,sir->tsr", x.astype(jnp.float32),
                    a_stack.astype(jnp.float32))  # [T, S, r]
    onehot = jax.nn.one_hot(lora_idx, S, dtype=jnp.float32)  # [T, S]
    xa_sel = jnp.einsum("tsr,ts->tr", xa, onehot)
    b_sel = jnp.einsum("sro,ts->tro", b_stack.astype(jnp.float32), onehot)
    delta = jnp.einsum("tr,tro->to", xa_sel, b_sel)
    return (delta * jnp.take(scaling, lora_idx)[:, None]).astype(x.dtype)
