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


def apply_top_k_top_p_min_p(logits: jax.Array, top_k: jax.Array,
                            top_p: jax.Array,
                            min_p: jax.Array) -> jax.Array:
    """Mask logits outside the per-row top-k / nucleus top-p / min-p sets
    (reference sampler.py:223,255). Runs on sorted logits; O(V log V)."""
    B, V = logits.shape
    sorted_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)

    ranks = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    # top-k: keep ranks < k
    k_mask = ranks < jnp.clip(top_k, 1, V)[:, None]

    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cumsum = jnp.cumsum(probs, axis=-1)
    # top-p: keep while cumulative prob (exclusive) < p; always keep rank 0
    p_mask = (cumsum - probs) < top_p[:, None]

    # min-p: keep probs >= min_p * max_prob (max prob is at rank 0)
    top_prob = probs[:, 0:1]
    m_mask = probs >= (min_p[:, None] * top_prob)

    keep_sorted = k_mask & p_mask & m_mask
    masked_sorted = jnp.where(keep_sorted, sorted_logits, _NEG_INF)
    # Scatter back to vocab order via the inverse permutation.
    inv = jnp.argsort(sorted_idx, axis=-1)
    return jnp.take_along_axis(masked_sorted, inv, axis=-1)


def sample(
    logits: jax.Array,  # [B, V] f32
    t: SamplingTensors,
    *,
    max_logprobs: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Full sampling pipeline. Returns (token_ids [B], logprob_of_token [B],
    topk_logprob_vals [B, max_logprobs], topk_token_ids [B, max_logprobs])."""
    logits = logits.astype(jnp.float32)
    if t.output_token_counts is not None:
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
