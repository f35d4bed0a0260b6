"""On-device sampling ops.

The reference samples on GPU in vllm/model_executor/layers/sampler.py and —
on its TPU port — inside the compiled graph (tpu_model_runner.py:503-588).
Here the whole pipeline runs in-graph on static shapes:

  penalties -> temperature -> top-k -> top-p -> min-p -> categorical/argmax

All per-request knobs are vectors of length B so one executable serves every
sampling configuration. Seeded requests get per-request PRNG keys folded with
the step counter on the host. Greedy rows (temperature < eps) take argmax.
Top-n logprobs for the API are computed in-graph via top_k.
"""
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

_SAMPLING_EPS = 1e-5
_NEG_INF = float("-inf")


class SamplingTensors(NamedTuple):
    """Per-row sampling knobs, padded to the decode bucket."""
    temperature: jax.Array  # [B] f32
    top_k: jax.Array  # [B] i32 (vocab_size = disabled)
    top_p: jax.Array  # [B] f32
    min_p: jax.Array  # [B] f32
    presence_penalty: jax.Array  # [B] f32
    frequency_penalty: jax.Array  # [B] f32
    repetition_penalty: jax.Array  # [B] f32
    keys: jax.Array  # [B, 2] u32 per-request PRNG keys
    # Token-occurrence counts for penalty application: prompt + output.
    # [B, V] i32 built on device from token buffers by the runner, or zeros
    # when no request in the batch uses penalties (the common fast path).
    output_token_counts: Optional[jax.Array] = None
    prompt_token_mask: Optional[jax.Array] = None  # [B, V] bool
    # OR: raw padded token-history buffers (pad sentinel = vocab_size,
    # dropped by the in-graph bincount). The runner ships these instead of
    # the [B, V] maps — O(hist) bytes over PCIe, counts built on device
    # (the reference builds its penalty tensors on-GPU the same way,
    # sampler.py:155-221).
    prompt_tokens: Optional[jax.Array] = None  # [B, P] i32
    output_tokens: Optional[jax.Array] = None  # [B, O] i32
    output_len: Optional[jax.Array] = None  # [B] i32 (multi-step append)


def apply_penalties(logits: jax.Array, prompt_mask: jax.Array,
                    output_counts: jax.Array, presence: jax.Array,
                    frequency: jax.Array,
                    repetition: jax.Array) -> jax.Array:
    """Presence/frequency/repetition penalties
    (reference sampler.py:200 _apply_penalties)."""
    output_mask = output_counts > 0
    seen = prompt_mask | output_mask
    rep = repetition[:, None]
    logits = jnp.where(seen,
                       jnp.where(logits > 0, logits / rep, logits * rep),
                       logits)
    logits = logits - frequency[:, None] * output_counts
    logits = logits - presence[:, None] * output_mask
    return logits


_BISECT_ITERS = 30


def _topk_threshold(logits: jax.Array, k: jax.Array) -> jax.Array:
    """Per-row threshold T with count(logits > T) >= k, via float bisection
    — a sort over a 128k vocab costs ~100x more than 30 masked reductions
    on TPU, so this replaces the reference's sort-based _apply_top_k
    (sampler.py:223)."""
    B, V = logits.shape
    k = jnp.clip(k, 1, V)[:, None].astype(jnp.int32)
    lo = jnp.min(logits, axis=-1, keepdims=True) - 1.0
    hi = jnp.max(logits, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        c = jnp.sum(logits > mid, axis=-1, keepdims=True)
        take_lo = c >= k
        return (jnp.where(take_lo, mid, lo), jnp.where(take_lo, hi, mid))

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    return lo


def _topp_threshold(probs: jax.Array, p: jax.Array) -> jax.Array:
    """Largest per-row prob threshold whose kept mass >= p (the nucleus set
    is exactly {prob >= T*}); bisection replaces sorted cumsum
    (reference _apply_top_p, sampler.py:223)."""
    lo = jnp.zeros((probs.shape[0], 1), probs.dtype)
    hi = jnp.max(probs, axis=-1, keepdims=True)
    p = p[:, None]

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(probs >= mid, probs, 0.0), axis=-1,
                       keepdims=True)
        enough = mass >= p
        return (jnp.where(enough, mid, lo), jnp.where(enough, hi, mid))

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    return lo


def apply_top_k_top_p_min_p(logits: jax.Array, top_k: jax.Array,
                            top_p: jax.Array,
                            min_p: jax.Array) -> jax.Array:
    """Mask logits outside the per-row top-k / nucleus top-p / min-p sets
    (reference sampler.py:223,255), sort-free."""
    B, V = logits.shape
    k_thr = _topk_threshold(logits, top_k)
    keep = logits > k_thr

    probs = jax.nn.softmax(logits, axis=-1)
    p_thr = _topp_threshold(probs, jnp.clip(top_p, 0.0, 1.0))
    keep &= probs >= p_thr

    top_prob = jnp.max(probs, axis=-1, keepdims=True)
    keep &= probs >= (min_p[:, None] * top_prob)
    return jnp.where(keep, logits, _NEG_INF)


def sample(
    logits: jax.Array,  # [B, V] f32
    t: SamplingTensors,
    *,
    max_logprobs: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Full sampling pipeline. Returns (token_ids [B], logprob_of_token [B],
    topk_logprob_vals [B, max_logprobs], topk_token_ids [B, max_logprobs])."""
    logits = logits.astype(jnp.float32)
    if t.output_tokens is not None:
        V = logits.shape[-1]
        counts = jax.vmap(lambda x: jnp.bincount(x, length=V))(
            t.output_tokens)
        pmask = jax.vmap(lambda x: jnp.bincount(x, length=V))(
            t.prompt_tokens) > 0
        logits = apply_penalties(logits, pmask, counts,
                                 t.presence_penalty, t.frequency_penalty,
                                 t.repetition_penalty)
    elif t.output_token_counts is not None:
        logits = apply_penalties(logits, t.prompt_token_mask,
                                 t.output_token_counts, t.presence_penalty,
                                 t.frequency_penalty, t.repetition_penalty)

    # Raw (pre-truncation) logprobs: the reference reports logprobs of the
    # temperature-scaled, penalty-adjusted distribution (sampler.py:692).
    greedy = t.temperature < _SAMPLING_EPS
    safe_temp = jnp.where(greedy, 1.0, t.temperature)
    scaled = logits / safe_temp[:, None]
    logprobs = jax.nn.log_softmax(scaled, axis=-1)

    masked = apply_top_k_top_p_min_p(scaled, t.top_k, t.top_p, t.min_p)

    # Gumbel-max categorical with per-row keys.
    def row_gumbel(key, row):
        return jax.random.gumbel(jax.random.wrap_key_data(key),
                                 row.shape, dtype=row.dtype)

    gumbel = jax.vmap(row_gumbel)(t.keys, masked)
    sampled = jnp.argmax(masked + gumbel, axis=-1)
    argmax_ids = jnp.argmax(logits, axis=-1)
    token_ids = jnp.where(greedy, argmax_ids, sampled).astype(jnp.int32)

    chosen_logprob = jnp.take_along_axis(logprobs, token_ids[:, None],
                                         axis=-1)[:, 0]
    if max_logprobs > 0:
        top_vals, top_ids = jax.lax.top_k(logprobs, max_logprobs)
    else:
        B = logits.shape[0]
        top_vals = jnp.zeros((B, 0), dtype=jnp.float32)
        top_ids = jnp.zeros((B, 0), dtype=jnp.int32)
    return token_ids, chosen_logprob, top_vals, top_ids.astype(jnp.int32)
