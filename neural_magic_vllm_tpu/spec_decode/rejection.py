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
