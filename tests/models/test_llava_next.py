"""LLaVA-NeXT (AnyRes) correctness vs HF: tiled encode + spatial
reassembly (unpad + newline) must reproduce HF generate exactly on the
same pixel_values."""
import numpy as np
import pytest

from tests.utils import create_tiny_tokenizer

IMG = 32
PINPOINTS = [[28, 56], [56, 28], [56, 56]]


@pytest.fixture(scope="module")
def llava_next_dir(tmp_path_factory):
    import torch
    from transformers import (CLIPVisionConfig, LlamaConfig,
                              LlavaNextConfig,
                              LlavaNextForConditionalGeneration)
    torch.manual_seed(0)
    vc = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=4,
                          image_size=28, patch_size=14)
    tc = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=512,
                     tie_word_embeddings=False)
    cfg = LlavaNextConfig(vision_config=vc, text_config=tc,
                          image_token_index=IMG,
                          image_grid_pinpoints=PINPOINTS,
                          vision_feature_layer=-2,
                          torch_dtype="float32")
    d = str(tmp_path_factory.mktemp("llava_next") / "ckpt")
    m = LlavaNextForConditionalGeneration(cfg).to(torch.float32)
    m.save_pretrained(d, safe_serialization=True)
    create_tiny_tokenizer(d, vocab_size=512)
    return d


def _hf_processed(llava_next_dir, img):
    """HF image processor output for a raw HWC uint8 image."""
    from transformers import LlavaNextImageProcessor
    proc = LlavaNextImageProcessor(
        size={"shortest_edge": 28},
        crop_size={"height": 28, "width": 28},
        image_grid_pinpoints=PINPOINTS)
    out = proc(images=img, return_tensors="np")
    return out["pixel_values"], out["image_sizes"]


def test_llava_next_engine_matches_hf(llava_next_dir):
    import torch
    from transformers import AutoConfig, LlavaNextForConditionalGeneration

    from neural_magic_vllm_tpu import LLM, SamplingParams
    from neural_magic_vllm_tpu.multimodal import MULTIMODAL_REGISTRY

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (20, 56, 3)).astype(np.uint8)  # non-square
    pv, sizes = _hf_processed(llava_next_dir, img)
    pv = pv.reshape(-1, 3, 28, 28).astype(np.float32)
    cfg = AutoConfig.from_pretrained(llava_next_dir)
    mm_inputs = {"pixel_values": pv, "image_sizes": np.asarray(sizes),
                 "crops_per_image": np.asarray([pv.shape[0]])}
    counts = MULTIMODAL_REGISTRY.tokens_per_image_list(cfg, mm_inputs)
    prompt_ids = [1] + [IMG] * counts[0] + [17, 29, 45]

    hf = LlavaNextForConditionalGeneration.from_pretrained(
        llava_next_dir, torch_dtype=torch.float32).eval()
    with torch.no_grad():
        gen = hf.generate(input_ids=torch.tensor([prompt_ids]),
                          pixel_values=torch.tensor(pv),
                          image_sizes=torch.tensor(sizes),
                          max_new_tokens=6, do_sample=False,
                          pad_token_id=0)
    gold = gen[0][len(prompt_ids):].tolist()

    llm = LLM(model=llava_next_dir, dtype="float32", max_model_len=256,
              block_size=16, num_gpu_blocks_override=96, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        detokenize=False)
    outs = llm.generate(
        prompt_token_ids=[prompt_ids], sampling_params=sp,
        multi_modal_data={"image": {
            "pixel_values": pv, "image_sizes": np.asarray(sizes)}},
        use_tqdm=False)
    got = list(outs[0].outputs[0].token_ids)
    assert got == gold

    # raw-image path: mapper + auto-expansion must serve end-to-end
    outs2 = llm.generate(prompt_token_ids=[[1, IMG, 17, 29]],
                         sampling_params=sp,
                         multi_modal_data={"image": img}, use_tqdm=False)
    assert len(list(outs2[0].outputs[0].token_ids)) == 6


def test_llava_next_mapper_matches_hf_processor(llava_next_dir):
    from transformers import AutoConfig

    from neural_magic_vllm_tpu.multimodal.registry import \
        llava_next_image_mapper
    cfg = AutoConfig.from_pretrained(llava_next_dir)
    rng = np.random.default_rng(5)
    # exact-fit size: no interpolation ambiguity vs HF resample choices
    img = rng.integers(0, 256, (28, 56, 3)).astype(np.uint8)
    got = llava_next_image_mapper(cfg, img)
    pv, sizes = _hf_processed(llava_next_dir, img)
    pv = pv.reshape(-1, 3, 28, 28)
    assert got["pixel_values"].shape == pv.shape
    assert got["image_sizes"].tolist() == np.asarray(sizes).tolist()
    # tiles (non-base crops) are resize-free at exact-fit sizes
    np.testing.assert_allclose(got["pixel_values"][1:], pv[1:], atol=1e-4)
