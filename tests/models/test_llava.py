"""LLaVA multimodal correctness: the JAX CLIP tower + projector + merged
prefill must match HF LlavaForConditionalGeneration (the reference's
models/llava tests compare against HF goldens the same way)."""
import numpy as np
import pytest

from tests.utils import create_tiny_llava_checkpoint

TPI = 4  # (28/14)^2 patches per image with CLS dropped
IMG = 32  # image_token_index


@pytest.fixture(scope="module")
def llava_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("llava") / "ckpt"
    return create_tiny_llava_checkpoint(str(d))


def _pixel_values(n=1, seed=3):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 3, 28, 28)).astype(np.float32)


def test_clip_tower_matches_hf(llava_dir):
    import torch
    from transformers import AutoConfig, LlavaForConditionalGeneration

    from neural_magic_vllm_tpu.config import ModelConfig
    from neural_magic_vllm_tpu.models.llava import \
        LlavaForConditionalGeneration as NmvLlava

    pv = _pixel_values(2)
    hf = LlavaForConditionalGeneration.from_pretrained(
        llava_dir, torch_dtype=torch.float32).eval()
    with torch.no_grad():
        feats = hf.vision_tower(torch.tensor(pv),
                                output_hidden_states=True).hidden_states[-2]
        feats = feats[:, 1:]  # drop CLS (strategy "default")
        gold = hf.multi_modal_projector(feats).numpy()

    mc = ModelConfig(model=llava_dir, dtype="float32",
                     hf_config=AutoConfig.from_pretrained(llava_dir),
                     skip_tokenizer_init=True)
    model = NmvLlava(mc)
    params = model.load_params(llava_dir)
    ours = np.asarray(model.encode_images(params, pv))
    np.testing.assert_allclose(ours, gold.reshape(ours.shape), atol=2e-4,
                               rtol=1e-3)


def _hf_mm_greedy(model_dir, prompt_ids, pv, max_new):
    import torch
    from transformers import LlavaForConditionalGeneration
    hf = LlavaForConditionalGeneration.from_pretrained(
        model_dir, torch_dtype=torch.float32).eval()
    with torch.no_grad():
        out = hf.generate(input_ids=torch.tensor([prompt_ids]),
                          pixel_values=torch.tensor(pv),
                          max_new_tokens=max_new, do_sample=False,
                          pad_token_id=0)
    return out[0][len(prompt_ids):].tolist()


def test_llava_engine_matches_hf_greedy(llava_dir):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    pv = _pixel_values(1)
    # pre-expanded prompt: one run of TPI image tokens + text
    prompt_ids = [1] + [IMG] * TPI + [17, 29, 45, 8]
    gold = _hf_mm_greedy(llava_dir, prompt_ids, pv, 6)

    llm = LLM(model=llava_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        detokenize=False)
    outs = llm.generate(prompt_token_ids=[prompt_ids],
                        sampling_params=sp,
                        multi_modal_data={"image": {"pixel_values": pv}},
                        use_tqdm=False)
    got = list(outs[0].outputs[0].token_ids)
    assert got == gold

    # single-placeholder prompt auto-expands to the same request
    short_ids = [1, IMG, 17, 29, 45, 8]
    outs2 = llm.generate(prompt_token_ids=[short_ids],
                         sampling_params=sp,
                         multi_modal_data={"image": {"pixel_values": pv}},
                         use_tqdm=False)
    assert list(outs2[0].outputs[0].token_ids) == gold

    # text-only requests still work on a multimodal model
    outs3 = llm.generate(prompt_token_ids=[[1, 17, 29, 45, 8]],
                         sampling_params=sp, use_tqdm=False)
    assert len(list(outs3[0].outputs[0].token_ids)) == 6


def test_image_mapper_preprocessing(llava_dir):
    """Raw HWC uint8 image -> CLIP-normalized pixel_values matching HF's
    CLIPImageProcessor on an exact-size image."""
    from transformers import AutoConfig, CLIPImageProcessor

    from neural_magic_vllm_tpu.multimodal import MULTIMODAL_REGISTRY
    cfg = AutoConfig.from_pretrained(llava_dir)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (28, 28, 3)).astype(np.uint8)
    got = MULTIMODAL_REGISTRY.map_input(cfg, {"image": img})["pixel_values"]
    proc = CLIPImageProcessor(size={"shortest_edge": 28},
                              crop_size={"height": 28, "width": 28})
    gold = proc(images=img, return_tensors="np")["pixel_values"]
    np.testing.assert_allclose(got, gold, atol=1e-5)
    assert got.shape == (1, 3, 28, 28)
