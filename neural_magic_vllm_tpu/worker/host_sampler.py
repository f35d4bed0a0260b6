"""Host-side sampling fallback.

Covers the features the on-device fast path does not: penalties over token
histories, user logits processors (guided decoding), prompt logprobs, and
beam search — mirroring the full pipeline of the reference Sampler
(vllm/model_executor/layers/sampler.py:50-119). Invoked only when a batch
contains at least one request needing it; the engine pays one logits
device->host transfer for those steps.
"""
import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from neural_magic_vllm_tpu.sampling_params import SamplingParams, SamplingType
from neural_magic_vllm_tpu.sequence import Logprob

_SAMPLING_EPS = 1e-5


def _log_softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return (x - m) - np.log(e.sum(axis=-1, keepdims=True))


def _apply_penalties(logits: np.ndarray, prompt_ids: List[int],
                     output_ids: List[int], sp: SamplingParams) -> np.ndarray:
    if (abs(sp.presence_penalty) < _SAMPLING_EPS
            and abs(sp.frequency_penalty) < _SAMPLING_EPS
            and abs(sp.repetition_penalty - 1.0) < _SAMPLING_EPS):
        return logits
    vocab = logits.shape[-1]
    out_counts = np.bincount(
        [t for t in output_ids if t < vocab], minlength=vocab)
    prompt_mask = np.zeros(vocab, dtype=bool)
    pids = [t for t in prompt_ids if t < vocab]
    prompt_mask[pids] = True
    seen = prompt_mask | (out_counts > 0)
    rep = sp.repetition_penalty
    logits = np.where(seen, np.where(logits > 0, logits / rep, logits * rep),
                      logits)
    logits = logits - sp.frequency_penalty * out_counts
    logits = logits - sp.presence_penalty * (out_counts > 0)
    return logits


def _apply_min_tokens(logits: np.ndarray, sp: SamplingParams,
                      output_len: int, eos_token_id: Optional[int]
                      ) -> np.ndarray:
    if sp.min_tokens and output_len < sp.min_tokens:
        stop_ids = set(sp.stop_token_ids)
        if eos_token_id is not None and not sp.ignore_eos:
            stop_ids.add(eos_token_id)
        for tid in stop_ids:
            if 0 <= tid < logits.shape[-1]:
                logits[tid] = -math.inf
    return logits


def _truncate(logits: np.ndarray, sp: SamplingParams) -> np.ndarray:
    V = logits.shape[-1]
    if sp.top_k > 0 and sp.top_k < V:
        kth = np.partition(logits, -sp.top_k)[-sp.top_k]
        logits = np.where(logits < kth, -math.inf, logits)
    if sp.top_p < 1.0 - _SAMPLING_EPS or sp.min_p > _SAMPLING_EPS:
        order = np.argsort(-logits)
        sorted_logits = logits[order]
        probs = np.exp(sorted_logits - sorted_logits.max())
        probs = probs / probs.sum()
        if sp.top_p < 1.0 - _SAMPLING_EPS:
            cum = np.cumsum(probs) - probs
            keep = cum < sp.top_p
            sorted_logits = np.where(keep, sorted_logits, -math.inf)
        if sp.min_p > _SAMPLING_EPS:
            keep = probs >= sp.min_p * probs[0]
            sorted_logits = np.where(keep, sorted_logits, -math.inf)
        inv = np.argsort(order)
        logits = sorted_logits[inv]
    return logits


def sample_row(
    logits: np.ndarray,  # [V] f32 raw model logits
    sp: SamplingParams,
    prompt_ids: List[int],
    output_ids: List[int],
    *,
    eos_token_id: Optional[int] = None,
    step_seed: int = 0,
    entropy: int = 0,
    num_logprobs: int = 0,
) -> Tuple[int, Dict[int, Logprob]]:
    """Sample one token and its logprob dict for one sequence.

    ``entropy`` is per-request randomness for UNSEEDED requests (the
    device sampler folds hash(request_id) the same way); explicit
    sp.seed stays fully reproducible and ignores it."""
    logits = logits.astype(np.float64).copy()
    for proc in sp.logits_processors:
        logits = np.asarray(proc(list(output_ids), logits))
    logits = _apply_penalties(logits, prompt_ids, output_ids, sp)
    logits = _apply_min_tokens(logits, sp, len(output_ids), eos_token_id)

    if sp.sampling_type == SamplingType.GREEDY:
        logprobs = _log_softmax(logits)
        token = int(np.argmax(logits))
    else:
        scaled = logits / max(sp.temperature, _SAMPLING_EPS)
        logprobs = _log_softmax(scaled)
        masked = _truncate(scaled.copy(), sp)
        probs = np.exp(masked - np.nanmax(masked))
        probs[~np.isfinite(masked)] = 0.0
        probs = probs / probs.sum()
        seed = sp.seed if sp.seed is not None else entropy
        rng = np.random.default_rng((seed + step_seed * 1000003) % 2**63)
        token = int(rng.choice(len(probs), p=probs))

    lp: Dict[int, Logprob] = {}
    if num_logprobs > 0:
        top_idx = np.argpartition(-logprobs, num_logprobs)[:num_logprobs]
        top_idx = top_idx[np.argsort(-logprobs[top_idx])]
        for rank, tid in enumerate(top_idx):
            lp[int(tid)] = Logprob(float(logprobs[tid]), rank=rank + 1)
    if token not in lp:
        rank = int((logprobs > logprobs[token]).sum()) + 1
        lp[token] = Logprob(float(logprobs[token]), rank=rank)
    return token, lp


def _logprob_dict(row: np.ndarray, tid: int,
                  num_logprobs: int) -> Dict[int, Logprob]:
    d: Dict[int, Logprob] = {}
    if num_logprobs > 0:
        top_idx = np.argpartition(-row, num_logprobs)[:num_logprobs]
        top_idx = top_idx[np.argsort(-row[top_idx])]
        for rank, t in enumerate(top_idx):
            d[int(t)] = Logprob(float(row[t]), rank=rank + 1)
    if tid not in d:
        rank = int((row > row[tid]).sum()) + 1
        d[tid] = Logprob(float(row[tid]), rank=rank)
    return d


def prompt_logprobs_from_chunk(
        logits: np.ndarray,  # [S, V] logits for positions start..start+S-1
        prompt_ids: List[int], start: int, num_logprobs: int,
        first_chunk: bool) -> List[Optional[Dict]]:
    """Prompt logprobs for ONE (chunked/context) prefill chunk: row j
    predicts the token at position start+j+1. The first chunk leads with
    None padding for position 0 and any prefix-cache-covered positions
    (their logits were never computed — the reference's prefix-cache
    semantics); later chunks return only their own positions, appended by
    the output processor."""
    P = len(prompt_ids)
    out: List[Optional[Dict[int, Logprob]]] =         [None] * (start + 1) if first_chunk else []
    lps = _log_softmax(logits.astype(np.float64))
    for j in range(logits.shape[0]):
        pos = start + j + 1
        if pos >= P:
            break
        out.append(_logprob_dict(lps[j], prompt_ids[pos], num_logprobs))
    return out


def prompt_logprobs_from_logits(
        logits: np.ndarray,  # [S, V] logits for prompt positions
        prompt_ids: List[int], num_logprobs: int) -> List[Optional[Dict]]:
    """Per-prompt-token logprobs (first position has none)."""
    out: List[Optional[Dict[int, Logprob]]] = [None]
    lps = _log_softmax(logits.astype(np.float64))
    for i in range(1, len(prompt_ids)):
        row = lps[i - 1]
        tid = prompt_ids[i]
        d: Dict[int, Logprob] = {}
        if num_logprobs > 0:
            top_idx = np.argpartition(-row, num_logprobs)[:num_logprobs]
            top_idx = top_idx[np.argsort(-row[top_idx])]
            for rank, t in enumerate(top_idx):
                d[int(t)] = Logprob(float(row[t]), rank=rank + 1)
        if tid not in d:
            rank = int((row > row[tid]).sum()) + 1
            d[tid] = Logprob(float(row[tid]), rank=rank)
        out.append(d)
    return out


def beam_candidates(logits: np.ndarray, num: int,
                    sp: SamplingParams) -> List[Tuple[int, Dict[int,
                                                                Logprob]]]:
    """Top-`num` tokens by logprob for beam search (reference
    sampler.py _beam_search_sample): returns (token, {token: Logprob})
    per candidate."""
    logits = logits.astype(np.float64)
    for proc in sp.logits_processors:
        logits = np.asarray(proc([], logits))
    logprobs = _log_softmax(logits)
    top = np.argsort(-logprobs)[:num]
    return [(int(t), {int(t): Logprob(float(logprobs[t]), rank=r + 1)})
            for r, t in enumerate(top)]
