"""SamplingParams validation surface
(reference tests/test_sampling_params.py)."""
import pytest

from neural_magic_vllm_tpu.sampling_params import SamplingParams, SamplingType


def test_max_tokens_none_allowed():
    SamplingParams(temperature=0.01, top_p=0.1, max_tokens=None)


def test_defaults():
    sp = SamplingParams()
    assert sp.n == 1 and sp.best_of == 1
    assert sp.max_tokens == 16
    assert sp.stop == [] and sp.stop_token_ids == []


def test_greedy_normalizes_knobs():
    sp = SamplingParams(temperature=0.0, top_p=0.5, top_k=10, min_p=0.2)
    assert sp.sampling_type == SamplingType.GREEDY
    assert sp.top_p == 1.0 and sp.top_k == -1 and sp.min_p == 0.0


def test_sampling_types():
    assert SamplingParams(temperature=1.0).sampling_type == \
        SamplingType.RANDOM
    assert SamplingParams(temperature=1.0, seed=7).sampling_type == \
        SamplingType.RANDOM_SEED
    assert SamplingParams(use_beam_search=True, best_of=2,
                          temperature=0.0).sampling_type == \
        SamplingType.BEAM
    # seed=-1 is the OpenAI-conventional "unseeded"
    assert SamplingParams(temperature=1.0, seed=-1).seed is None


@pytest.mark.parametrize("bad_kwargs", [
    dict(n=0),
    dict(best_of=0),
    dict(n=2, best_of=1),
    dict(temperature=-0.1),
    dict(top_p=0.0),
    dict(top_p=1.5),
    dict(top_k=0),
    dict(top_k=-2),
    dict(min_p=-0.5),
    dict(min_p=1.5),
    dict(presence_penalty=3.0),
    dict(presence_penalty=-3.0),
    dict(frequency_penalty=2.5),
    dict(repetition_penalty=0.0),
    dict(max_tokens=0),
    dict(min_tokens=-1),
    dict(min_tokens=32, max_tokens=16),
    dict(logprobs=-1),
    dict(prompt_logprobs=-1),
    dict(truncate_prompt_tokens=0),
])
def test_invalid_args_rejected(bad_kwargs):
    bad_kwargs.setdefault("temperature", 1.0)
    with pytest.raises(ValueError):
        SamplingParams(**bad_kwargs)


def test_beam_search_validation():
    # beam search requires best_of > 1 and zero temperature
    with pytest.raises(ValueError):
        SamplingParams(use_beam_search=True, best_of=1)
    with pytest.raises(ValueError):
        SamplingParams(use_beam_search=True, best_of=2, temperature=0.7)
    sp = SamplingParams(use_beam_search=True, best_of=2, temperature=0.0,
                        length_penalty=0.5)
    assert sp.sampling_type == SamplingType.BEAM
    # early_stopping only takes {True, False, "never"}
    with pytest.raises(ValueError):
        SamplingParams(use_beam_search=True, best_of=2, temperature=0.0,
                       early_stopping="sometimes")


def test_non_beam_rejects_beam_knobs():
    with pytest.raises(ValueError):
        SamplingParams(early_stopping=True)
    with pytest.raises(ValueError):
        SamplingParams(length_penalty=0.5)


def test_greedy_rejects_multiple_candidates():
    with pytest.raises(ValueError):
        SamplingParams(temperature=0.0, best_of=2)


def test_stop_string_normalization():
    assert SamplingParams(stop="END").stop == ["END"]
    assert SamplingParams(stop=["a", "b"]).stop == ["a", "b"]


def test_clone_is_independent():
    sp = SamplingParams(temperature=0.5, stop=["x"])
    cl = sp.clone()
    cl.stop.append("y")
    assert sp.stop == ["x"]
