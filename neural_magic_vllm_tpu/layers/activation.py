"""Activations (reference csrc/activation_kernels.cu equivalents; XLA fuses
these into the adjacent GEMMs so no custom kernels are needed)."""
import jax
import jax.numpy as jnp


def silu_and_mul(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.silu(gate) * up


def gelu_and_mul(gate: jax.Array, up: jax.Array,
                 approximate: str = "none") -> jax.Array:
    return jax.nn.gelu(gate, approximate=(approximate == "tanh")) * up


def gelu_new(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


def gelu_fast(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + jnp.tanh(xf * 0.7978845608 *
                                       (1.0 + 0.044715 * xf * xf)))).astype(
                                           x.dtype)


def gelu_quick(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


ACT2FN = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "gelu_new": gelu_new,
    "gelu_fast": gelu_fast,
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
}
