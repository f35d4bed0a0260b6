"""Rejection sampling for speculative decoding (reference
vllm/model_executor/layers/rejection_sampler.py:11, specialised for one-hot
draft distributions — the ngram proposer is deterministic, so q(x) is a
delta at the proposed token; the modified rejection rule reduces to:
  accept x_i with probability p_target(x_i);
  on rejection, sample from p_target with x_i masked out (renormalised
  max(0, p - q) for one-hot q).
Greedy (temperature=0) reduces to: accept while argmax matches.

All target probabilities come from the SAME batched forward that scored the
proposals, so output distributions are exactly the target model's
(the lossless-ness property of speculative decoding)."""
from typing import List, Tuple

import numpy as np


def _softmax(logits: np.ndarray) -> np.ndarray:
    x = logits - logits.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def rejection_sample_greedy(logits: np.ndarray,
                            proposed: List[int]) -> List[int]:
    """logits [k+1, V] for positions p..p+k; proposed len k.
    Returns the accepted tokens plus the bonus/correction token
    (1..k+1 tokens total)."""
    targets = np.argmax(logits, axis=-1)  # [k+1]
    out: List[int] = []
    for i, prop in enumerate(proposed):
        tgt = int(targets[i])
        if prop == tgt:
            out.append(tgt)
        else:
            out.append(tgt)  # correction token replaces the rejected draft
            return out
    out.append(int(targets[len(proposed)]))  # bonus token
    return out


def rejection_sample_onehot(logits: np.ndarray, proposed: List[int],
                            temperature: float,
                            rng: np.random.Generator) -> List[int]:
    """Stochastic variant for one-hot drafts."""
    probs = _softmax(logits / max(temperature, 1e-5))
    out: List[int] = []
    for i, prop in enumerate(proposed):
        p = probs[i]
        if rng.random() < p[prop]:
            out.append(int(prop))
            continue
        # rejected: sample from renormalised p with the draft token removed
        p = p.copy()
        p[prop] = 0.0
        s = p.sum()
        if s <= 0:
            out.append(int(np.argmax(probs[i])))
        else:
            out.append(int(rng.choice(len(p), p=p / s)))
        return out
    p = probs[len(proposed)]
    out.append(int(rng.choice(len(p), p=p)))
    return out


def typical_acceptance(logits: np.ndarray, proposed: List[int],
                       temperature: float,
                       posterior_threshold: float = 0.09,
                       posterior_alpha: float = 0.3) -> List[int]:
    """Typical acceptance (reference typical_acceptance_sampler.py):
    accept draft x_i when p_target(x_i) clears an entropy-adaptive
    threshold max(posterior_threshold, alpha * exp(-H(p))); on rejection
    emit the target argmax. Cheaper/looser than exact rejection sampling —
    output distribution is APPROXIMATELY the target's."""
    probs = _softmax(logits / max(temperature, 1e-5))
    out: List[int] = []
    for i, prop in enumerate(proposed):
        p = probs[i]
        entropy = -float(np.sum(p * np.log(np.clip(p, 1e-10, None))))
        threshold = max(posterior_threshold,
                        posterior_alpha * np.exp(-entropy))
        if p[prop] > threshold:
            out.append(int(prop))
            continue
        out.append(int(np.argmax(p)))
        return out
    out.append(int(np.argmax(probs[len(proposed)])))
    return out


def onehot_rejection_ingraph(lg, proposals, plen, base_pos, temperature,
                             keys):
    """In-graph seeded one-hot rejection sampling (device side of
    rejection_sample_onehot; VERDICT r4 #4). Reference runs rejection
    on-accelerator too (rejection_sampler.py:11).

    lg [B, S, V] raw target logits (S = k + 1 rows per sequence);
    proposals [B, k] (-1 padded); plen [B]; base_pos [B] (len - 1, folds
    into the per-seq PRNG key); temperature [B] (0 = greedy);
    keys [B, 2] uint32. Returns (emitted [B, S] with -1 padding,
    n_out [B], chosen_logprobs [B, S] under the RAW logits — matching
    the host path's reporting semantics).

    Lossless: accept d_j with prob p_target(d_j) (one-hot draft), first
    reject resamples from the residual (p with d_j zeroed, renormalized),
    full accept bonus-samples row k unadjusted.
    """
    import jax
    import jax.numpy as jnp

    from neural_magic_vllm_tpu.spec_decode.draft_model import (_gumbel,
                                                               _uniform)

    def fold(ks, salt):
        k1 = ks[:, 1] ^ (salt.astype(jnp.uint32) * jnp.uint32(2654435761))
        return jnp.stack([ks[:, 0], k1], axis=1)

    B, S, V = lg.shape
    k = S - 1
    greedy = temperature < 1e-5
    safe_t = jnp.where(greedy, 1.0, temperature)
    p = jax.nn.softmax(lg / safe_t[:, None, None], axis=-1)
    prop_c = jnp.clip(proposals, 0)
    p_prop = jnp.take_along_axis(p[:, :k], prop_c[:, :, None],
                                 axis=2)[..., 0]  # [B, k]
    u = _uniform(fold(keys, base_pos), (B, k))
    jk = jax.lax.broadcasted_iota(jnp.int32, (B, k), 1)
    argmx = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # [B, S]
    accept = jnp.where(greedy[:, None], proposals == argmx[:, :k],
                       u < p_prop) & (jk < plen[:, None])
    n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1),
                    axis=1)  # [B]
    pr = jnp.take_along_axis(
        p, jnp.broadcast_to(n_acc[:, None, None], (B, 1, V)),
        axis=1)[:, 0]  # [B, V]: the reject/bonus row's distribution
    is_bonus = n_acc >= plen
    rej_tok = jnp.take_along_axis(prop_c,
                                  jnp.clip(n_acc, 0, k - 1)[:, None],
                                  axis=1)[:, 0]
    vio = jax.lax.broadcasted_iota(jnp.int32, pr.shape, 1)
    resid = jnp.where((~is_bonus[:, None]) & (vio == rej_tok[:, None]),
                      0.0, pr)
    g = _gumbel(fold(keys, base_pos * 31 + 7), resid.shape)
    stoch_pick = jnp.argmax(jnp.log(jnp.clip(resid, 1e-20, None)) + g,
                            axis=-1).astype(jnp.int32)
    greedy_pick = jnp.take_along_axis(argmx, n_acc[:, None],
                                      axis=1)[:, 0]
    final = jnp.where(greedy, greedy_pick, stoch_pick)
    js = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    emitted = jnp.where(
        js < n_acc[:, None], jnp.pad(prop_c, ((0, 0), (0, 1))),
        jnp.where(js == n_acc[:, None], final[:, None], -1))
    lse = jax.nn.logsumexp(lg, axis=-1)
    chosen = jnp.take_along_axis(lg, jnp.clip(emitted, 0)[:, :, None],
                                 axis=2)[..., 0]
    return emitted, n_acc + 1, chosen - lse
