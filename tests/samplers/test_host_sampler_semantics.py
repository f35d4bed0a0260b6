"""Host-sampler fixes from the worker review: EOS masked under
min_tokens, and per-request entropy for unseeded sampling."""
import numpy as np

from neural_magic_vllm_tpu.sampling_params import SamplingParams
from neural_magic_vllm_tpu.worker import host_sampler


def test_min_tokens_masks_eos():
    eos = 7
    logits = np.zeros(16, np.float32)
    logits[eos] = 10.0  # argmax is EOS
    logits[3] = 5.0
    sp = SamplingParams(temperature=0.0, min_tokens=5, max_tokens=10)
    token, _ = host_sampler.sample_row(logits, sp, [1, 2], [4, 5],
                                       eos_token_id=eos)
    assert token == 3  # EOS masked while output_len < min_tokens
    token, _ = host_sampler.sample_row(logits, sp, [1, 2], [4, 5, 6, 8, 9],
                                       eos_token_id=eos)
    assert token == eos  # min_tokens satisfied: EOS allowed again


def test_unseeded_requests_get_per_request_entropy():
    logits = np.zeros(64, np.float32)  # uniform: streams visibly differ
    sp = SamplingParams(temperature=1.0, max_tokens=4)
    toks = {host_sampler.sample_row(logits, sp, [1], [2, 3],
                                    step_seed=2, entropy=e)[0]
            for e in range(8)}
    assert len(toks) > 1, "entropy must decorrelate unseeded requests"
    # same entropy + step -> reproducible within the request
    a = host_sampler.sample_row(logits, sp, [1], [2, 3], step_seed=2,
                                entropy=5)[0]
    b = host_sampler.sample_row(logits, sp, [1], [2, 3], step_seed=2,
                                entropy=5)[0]
    assert a == b


def test_explicit_seed_ignores_entropy():
    logits = np.zeros(64, np.float32)
    sp = SamplingParams(temperature=1.0, seed=42, max_tokens=4)
    a = host_sampler.sample_row(logits, sp, [1], [2], step_seed=3,
                                entropy=1)[0]
    b = host_sampler.sample_row(logits, sp, [1], [2], step_seed=3,
                                entropy=999)[0]
    assert a == b
