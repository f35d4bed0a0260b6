"""E2E quantized-model correctness: a GPTQ-format checkpoint served through
the engine must produce the same greedy tokens as its exactly-dequantized
dense twin (the reference's models_core/test_llm_logprobs.py strategy —
quantized engine output vs the dequantized golden)."""
import numpy as np
import pytest

from tests.utils import (create_tiny_llama_checkpoint,
                         quantize_llama_checkpoint_gptq)

PROMPT_IDS = [
    [1, 17, 29, 45, 8, 100],
    [1, 5, 9, 301, 44],
]
MAX_NEW = 6


@pytest.fixture(scope="module", params=["sym", "asym"])
def quant_and_dense_dirs(request, tmp_path_factory):
    base = tmp_path_factory.mktemp("quant_models")
    src = str(base / "src")
    create_tiny_llama_checkpoint(src, hidden_size=64, intermediate_size=128,
                                 num_hidden_layers=2)
    quant_dir, dense_dir = str(base / "gptq"), str(base / "dense")
    quantize_llama_checkpoint_gptq(src, quant_dir, dense_dir, bits=4,
                                   group_size=32,
                                   asym=(request.param == "asym"))
    return quant_dir, dense_dir


def _greedy(model_dir):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True)
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_NEW,
                        ignore_eos=True, detokenize=False)
    outs = llm.generate(prompt_token_ids=PROMPT_IDS, sampling_params=sp,
                        use_tqdm=False)
    return [list(o.outputs[0].token_ids) for o in outs]


def test_gptq_engine_matches_dequantized_dense(quant_and_dense_dirs):
    quant_dir, dense_dir = quant_and_dense_dirs
    quant_tokens = _greedy(quant_dir)
    dense_tokens = _greedy(dense_dir)
    assert quant_tokens == dense_tokens


def test_quant_config_detection(quant_and_dense_dirs):
    quant_dir, _ = quant_and_dense_dirs
    from transformers import AutoConfig

    from neural_magic_vllm_tpu.config import ModelConfig
    from neural_magic_vllm_tpu.quantization import create_quant_config
    from neural_magic_vllm_tpu.quantization.gptq import GPTQConfig
    mc = ModelConfig(model=quant_dir, dtype="float32",
                     hf_config=AutoConfig.from_pretrained(quant_dir),
                     skip_tokenizer_init=True)
    qc = create_quant_config(mc)
    assert isinstance(qc, GPTQConfig)
    assert qc.bits == 4 and qc.group_size == 32


def test_gptq_mixtral_experts_match_dense(tmp_path):
    """W4A16 Mixtral: quantized experts (packed-in-HBM, mixtral_quant role)
    through the engine == exactly-dequantized dense twin."""
    from tests.utils import (create_tiny_mixtral_checkpoint,
                             quantize_llama_checkpoint_gptq)
    src = str(tmp_path / "src")
    create_tiny_mixtral_checkpoint(src, hidden_size=64, intermediate_size=128,
                                   num_hidden_layers=2, num_local_experts=4,
                                   num_experts_per_tok=2)
    quant_dir, dense_dir = str(tmp_path / "gptq"), str(tmp_path / "dense")
    quantize_llama_checkpoint_gptq(
        src, quant_dir, dense_dir, bits=4, group_size=32,
        extra_suffixes=("w1.weight", "w2.weight", "w3.weight"))
    quant_tokens = _greedy(quant_dir)
    dense_tokens = _greedy(dense_dir)
    assert quant_tokens == dense_tokens
