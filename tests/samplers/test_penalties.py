"""In-graph penalty sampling (ops/sampling.apply_penalties fed by
token-history buffers): unit equivalence of the buffer path vs explicit
count arrays, and e2e equivalence of the device penalty path vs a
host-side golden implementing the reference formula (sampler.py:200)."""
import numpy as np
import pytest

import jax.numpy as jnp

from neural_magic_vllm_tpu.ops.sampling import SamplingTensors, sample

from ..utils import create_tiny_llama_checkpoint


def _base_samp(B, V):
    return dict(
        temperature=jnp.zeros((B, ), jnp.float32),  # greedy
        top_k=jnp.full((B, ), V, jnp.int32),
        top_p=jnp.ones((B, ), jnp.float32),
        min_p=jnp.zeros((B, ), jnp.float32),
        presence_penalty=jnp.full((B, ), 0.3, jnp.float32),
        frequency_penalty=jnp.full((B, ), 0.2, jnp.float32),
        repetition_penalty=jnp.full((B, ), 1.4, jnp.float32),
        keys=jnp.zeros((B, 2), jnp.uint32))


def test_history_buffers_match_explicit_counts():
    rng = np.random.default_rng(0)
    B, V = 4, 64
    logits = jnp.asarray(rng.standard_normal((B, V)), jnp.float32)
    prompts = [rng.integers(0, V, rng.integers(3, 10)) for _ in range(B)]
    outputs = [rng.integers(0, V, rng.integers(0, 8)) for _ in range(B)]

    counts = np.zeros((B, V), np.int32)
    pmask = np.zeros((B, V), bool)
    for i in range(B):
        np.add.at(counts[i], outputs[i], 1)
        pmask[i, prompts[i]] = True

    P = max(len(p) for p in prompts)
    O = max(max(len(o) for o in outputs), 1)
    pt = np.full((B, P), V, np.int32)  # pad sentinel = V (dropped)
    ot = np.full((B, O), V, np.int32)
    for i in range(B):
        pt[i, :len(prompts[i])] = prompts[i]
        ot[i, :len(outputs[i])] = outputs[i]

    base = _base_samp(B, V)
    t_explicit = SamplingTensors(**base,
                                 output_token_counts=jnp.asarray(counts),
                                 prompt_token_mask=jnp.asarray(pmask))
    t_buffers = SamplingTensors(**base,
                                prompt_tokens=jnp.asarray(pt),
                                output_tokens=jnp.asarray(ot))
    tid_a, lp_a, _, _ = sample(logits, t_explicit)
    tid_b, lp_b, _, _ = sample(logits, t_buffers)
    np.testing.assert_array_equal(np.asarray(tid_a), np.asarray(tid_b))
    np.testing.assert_allclose(np.asarray(lp_a), np.asarray(lp_b),
                               rtol=1e-6)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pen-model")
    return create_tiny_llama_checkpoint(str(d / "tiny"))


def _golden_penalty_processor(pres, freq, rep):
    """Host logits processor implementing the reference penalty formula —
    routes the request down the host-sampling path as the golden."""

    class Proc:
        def __init__(self):
            self.prompt_ids = None

        def __call__(self, generated_ids, logits):
            out = logits.astype(np.float64).copy()
            counts = np.zeros_like(out, dtype=np.int64)
            np.add.at(counts, np.asarray(generated_ids, np.int64), 1)
            seen = counts > 0
            if self.prompt_ids is not None:
                seen = seen.copy()
                seen[np.asarray(self.prompt_ids, np.int64)] = True
            out = np.where(seen, np.where(out > 0, out / rep, out * rep),
                           out)
            out = out - freq * counts
            out = out - pres * (counts > 0)
            return out.astype(np.float32)

    return Proc()


def test_device_penalties_match_host_golden(model_dir):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    pres, freq, rep = 0.4, 0.3, 1.5
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=4,
              enforce_eager=True)
    prompts = ["repeat repeat repeat", "the the the the"]
    device = llm.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=16, presence_penalty=pres,
        frequency_penalty=freq, repetition_penalty=rep))
    device_toks = [tuple(o.outputs[0].token_ids) for o in device]

    goldens = []
    for p in prompts:
        proc = _golden_penalty_processor(pres, freq, rep)
        ids = llm.llm_engine.tokenizer.encode(p)
        proc.prompt_ids = ids
        out = llm.generate([p], SamplingParams(
            temperature=0.0, max_tokens=16, logits_processors=[proc]))
        goldens.append(tuple(out[0].outputs[0].token_ids))
    assert device_toks == goldens

    # no-penalty run must differ on these degenerate prompts (sanity that
    # the penalties actually did something)
    plain = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                 max_tokens=16))
    assert [tuple(o.outputs[0].token_ids) for o in plain] != device_toks


def test_multi_step_penalties_match_single_step(model_dir):
    """Fused K-step decode carries the output-history buffer in-graph;
    outputs must equal single-step execution."""
    from neural_magic_vllm_tpu import LLM, SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=16,
                        repetition_penalty=1.5, frequency_penalty=0.2)
    prompts = ["repeat repeat repeat", "count one two"]
    single = LLM(model=model_dir, dtype="float32", max_model_len=128,
                 block_size=16, num_gpu_blocks_override=64, max_num_seqs=4,
                 enforce_eager=True)
    want = [tuple(o.outputs[0].token_ids)
            for o in single.generate(prompts, sp)]
    multi = LLM(model=model_dir, dtype="float32", max_model_len=128,
                block_size=16, num_gpu_blocks_override=64, max_num_seqs=4,
                enforce_eager=True, num_scheduler_steps=4)
    got = [tuple(o.outputs[0].token_ids)
           for o in multi.generate(prompts, sp)]
    assert got == want
