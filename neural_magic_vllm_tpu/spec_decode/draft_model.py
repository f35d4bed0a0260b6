"""Draft-model speculative decoding, TPU-shaped.

The reference splits this across SpecDecodeWorker + MultiStepWorker +
BatchExpansionTop1Scorer + RejectionSampler (spec_decode_worker.py:73,
multi_step_worker.py:17, batch_expansion.py:19, rejection_sampler.py:11),
with k+2 device dispatches per step. Here the WHOLE speculative step is ONE
jitted executable:

  1. draft catch-up: feed the tokens committed since the draft last ran
     (masked fixed-length scan) so the draft KV cache mirrors the target's
  2. draft propose: k fused decode steps sampling d_1..d_k, keeping each
     step's full draft distribution q_i
  3. target verify: one forward over B*(k+1) flat rows (each sequence
     contributes its last token + the k drafts with incremental
     context_lens — the decode executable's native shape)
  4. in-graph rejection sampling: accept d_i with prob p_i(d_i)/q_i(d_i);
     at the first rejection resample from max(0, p_i - q_i) normalized;
     bonus token from p_{k+1} when everything is accepted. Lossless.

Both KV caches are donated; one host round trip commits up to k+1 tokens
per sequence.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from neural_magic_vllm_tpu.layers.attention import AttentionMetadata


def _gumbel(keys: jax.Array, shape) -> jax.Array:
    def row(key):
        return jax.random.gumbel(jax.random.wrap_key_data(key), shape[1:],
                                 dtype=jnp.float32)

    return jax.vmap(row)(keys)


def _uniform(keys: jax.Array, shape) -> jax.Array:
    def row(key):
        return jax.random.uniform(jax.random.wrap_key_data(key), shape[1:],
                                  dtype=jnp.float32)

    return jax.vmap(row)(keys)


def build_spec_step(target_model, draft_model, block_size: int, k: int):
    """Returns fn(params, draft_params, target_kv, draft_kv, inputs...) ->
    (new_target_kv, new_draft_kv, out_tokens [B, k+1], n_out [B],
    chosen_logprobs [B, k+1])."""

    def fold(keys, salt):
        k1 = keys[:, 1] ^ (salt.astype(jnp.uint32) * jnp.uint32(2654435761))
        return jnp.stack([keys[:, 0], k1], axis=1)

    def fn(params, draft_params, kv, draft_kv,
           catchup_tokens,   # [B, k] committed tokens the draft missed
           catchup_pos,      # [B, k] their indices (garbage when invalid)
           catchup_valid,    # [B, k] bool
           last_tokens,      # [B] token at len-1 (first propose feed)
           positions,        # [B] = len-1
           tables,           # [B, W]
           valid,            # [B] real (non-padded) rows
           temperature,      # [B] f32 (0 = greedy)
           keys):            # [B, 2] uint32
        bs = block_size

        def slot_of(pos, ok):
            blk = jnp.take_along_axis(tables, (pos // bs)[:, None],
                                      axis=1)[:, 0]
            return jnp.where(ok, blk * bs + pos % bs, -1)

        # --- 1. draft catch-up (masked fixed scan) -------------------------
        def catchup_body(dkv, j):
            tok = catchup_tokens[:, j]
            pos = catchup_pos[:, j]
            ok = catchup_valid[:, j] & valid
            meta = AttentionMetadata(slot_mapping=slot_of(pos, ok),
                                     block_tables=tables,
                                     context_lens=pos + 1)
            _, dkv = draft_model.forward(draft_params, tok, pos, dkv, meta,
                                         is_prefill=False)
            return dkv, ()

        draft_kv, _ = jax.lax.scan(catchup_body, draft_kv,
                                   jnp.arange(k, dtype=jnp.int32))

        # --- 2. draft propose: k decode steps, sampling from q_i ----------
        greedy = temperature < 1e-5
        safe_t = jnp.where(greedy, 1.0, temperature)

        def propose_body(carry, i):
            dkv, tok, pos = carry
            meta = AttentionMetadata(slot_mapping=slot_of(pos, valid),
                                     block_tables=tables,
                                     context_lens=pos + 1)
            hidden, dkv = draft_model.forward(draft_params, tok, pos, dkv,
                                              meta, is_prefill=False)
            logits = draft_model.compute_logits(draft_params, hidden)
            q = jax.nn.softmax(logits / safe_t[:, None], axis=-1)  # [B, V]
            g = _gumbel(fold(keys, pos * 2 + i), q.shape)
            sampled = jnp.argmax(jnp.log(jnp.clip(q, 1e-20, None)) + g,
                                 axis=-1)
            d = jnp.where(greedy, jnp.argmax(logits, axis=-1),
                          sampled).astype(jnp.int32)
            return (dkv, d, pos + 1), (d, q)

        (draft_kv, _, _), (drafts, qs) = jax.lax.scan(
            propose_body, (draft_kv, last_tokens, positions),
            jnp.arange(k, dtype=jnp.int32))
        drafts = drafts.T  # [B, k]
        qs = jnp.swapaxes(qs, 0, 1)  # [B, k, V]

        # --- 3. target verify over B*(k+1) flat rows -----------------------
        B = last_tokens.shape[0]
        S = k + 1
        row_tokens = jnp.concatenate([last_tokens[:, None], drafts],
                                     axis=1).reshape(-1)  # [B*S]
        offs = jnp.arange(S, dtype=jnp.int32)[None, :]
        row_pos = (positions[:, None] + offs).reshape(-1)
        row_valid = jnp.repeat(valid, S)
        row_tables = jnp.repeat(tables, S, axis=0)
        meta = AttentionMetadata(
            slot_mapping=jnp.where(
                row_valid,
                jnp.take_along_axis(row_tables,
                                    (row_pos // bs)[:, None],
                                    axis=1)[:, 0] * bs + row_pos % bs, -1),
            block_tables=row_tables,
            context_lens=row_pos + 1)
        hidden, kv = target_model.forward(params, row_tokens, row_pos, kv,
                                          meta, is_prefill=False)
        logits = target_model.compute_logits(params, hidden)
        logits = logits.reshape(B, S, -1)
        p = jax.nn.softmax(logits / safe_t[:, None, None], axis=-1)
        logp = jax.nn.log_softmax(logits / safe_t[:, None, None], axis=-1)

        # --- 4. rejection sampling (reference rejection_sampler.py) -------
        d_onehot = jax.nn.one_hot(drafts, p.shape[-1], dtype=jnp.bool_)
        p_d = jnp.take_along_axis(p[:, :k], drafts[..., None],
                                  axis=-1)[..., 0]  # [B, k]
        q_d = jnp.take_along_axis(qs, drafts[..., None], axis=-1)[..., 0]
        u = _uniform(fold(keys, positions * 7919 + 13), (B, k))
        ratio = p_d / jnp.clip(q_d, 1e-20, None)
        accept = u < ratio  # [B, k]
        greedy_accept = drafts == jnp.argmax(logits[:, :k], axis=-1)
        accept = jnp.where(greedy[:, None], greedy_accept, accept)
        # number of leading accepts
        n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1),
                        axis=1)  # [B] in [0, k]

        # recovery distribution at the first rejection: max(0, p - q)
        idx = jnp.minimum(n_acc, k - 1)
        p_rej = jnp.take_along_axis(p[:, :k], idx[:, None, None],
                                    axis=1)[:, 0]  # [B, V]
        q_rej = jnp.take_along_axis(qs, idx[:, None, None], axis=1)[:, 0]
        resid = jnp.clip(p_rej - q_rej, 0.0, None)
        resid_sum = jnp.sum(resid, axis=-1, keepdims=True)
        resid = jnp.where(resid_sum > 1e-9, resid / resid_sum, p_rej)
        g = _gumbel(fold(keys, positions * 31 + 7), resid.shape)
        resample = jnp.argmax(jnp.log(jnp.clip(resid, 1e-20, None)) + g,
                              axis=-1).astype(jnp.int32)
        greedy_resample = jnp.take_along_axis(
            jnp.argmax(logits[:, :k], axis=-1), idx[:, None],
            axis=1)[:, 0].astype(jnp.int32)
        resample = jnp.where(greedy, greedy_resample, resample)

        # bonus token (all k accepted): sample from p_{k+1}
        g2 = _gumbel(fold(keys, positions * 131 + 3), p[:, k].shape)
        bonus = jnp.argmax(jnp.log(jnp.clip(p[:, k], 1e-20, None)) + g2,
                           axis=-1).astype(jnp.int32)
        bonus = jnp.where(greedy, jnp.argmax(logits[:, k],
                                             axis=-1).astype(jnp.int32),
                          bonus)

        # assemble outputs: accepted drafts, then resample-or-bonus
        out_steps = jnp.where(n_acc[:, None] == k,
                              jnp.concatenate([drafts, bonus[:, None]],
                                              axis=1),
                              jnp.concatenate([drafts, drafts[:, -1:]],
                                              axis=1))
        # replace position n_acc with the resample token when n_acc < k
        pos_idx = jnp.arange(S, dtype=jnp.int32)[None, :]
        out_tokens = jnp.where(
            (pos_idx == n_acc[:, None]) & (n_acc[:, None] < k),
            resample[:, None], out_steps)
        n_out = n_acc + 1  # accepted + (resample | bonus)

        chosen_lp = jnp.take_along_axis(logp, out_tokens[..., None],
                                        axis=-1)[..., 0]  # [B, S]
        return kv, draft_kv, out_tokens, n_out, chosen_lp

    return fn
