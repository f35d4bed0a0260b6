"""Phi-3-Vision: engine greedy with image input must match a golden built
from HF pieces — CLIPVisionModel penultimate patch features, a handwritten
HD transform (2x2 merge, sub_GN separators, glb+glb_GN+sub), projection,
and HF Phi3ForCausalLM over the merged input embeddings."""
import json
import os

import numpy as np
import pytest

from tests.utils import create_tiny_tokenizer

V = 512
IMG_TOK = 500
S, PATCH = 32, 8  # vision image/patch size -> grid 4, half 2
VC_H = 32


@pytest.fixture(scope="module")
def phi3v_dir(tmp_path_factory):
    import torch
    from transformers import (CLIPVisionConfig, CLIPVisionModel, Phi3Config,
                              Phi3ForCausalLM)
    from safetensors.torch import save_file

    torch.manual_seed(0)
    vc = CLIPVisionConfig(hidden_size=VC_H, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=4,
                          image_size=S, patch_size=PATCH)
    vision = CLIPVisionModel(vc).to(torch.float32)
    tc = Phi3Config(vocab_size=V, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=4, max_position_embeddings=512,
                    rms_norm_eps=1e-5, tie_word_embeddings=False,
                    pad_token_id=0, bos_token_id=1, eos_token_id=2)
    text = Phi3ForCausalLM(tc).to(torch.float32)

    tensors = {}
    for name, w in text.state_dict().items():
        tensors[name] = w.contiguous()
    for name, w in vision.state_dict().items():
        # CLIPVisionModel prefixes with vision_model.
        tensors["model.vision_embed_tokens.img_processor." + name] = \
            w.contiguous()
    C4 = 4 * VC_H
    g = torch.Generator().manual_seed(1)
    tensors["model.vision_embed_tokens.glb_GN"] = \
        torch.randn(1, 1, C4, generator=g) * 0.1
    tensors["model.vision_embed_tokens.sub_GN"] = \
        torch.randn(1, 1, 1, C4, generator=g) * 0.1
    tensors["model.vision_embed_tokens.img_projection.0.weight"] = \
        torch.randn(64, C4, generator=g) / np.sqrt(C4)
    tensors["model.vision_embed_tokens.img_projection.0.bias"] = \
        torch.randn(64, generator=g) * 0.1
    tensors["model.vision_embed_tokens.img_projection.2.weight"] = \
        torch.randn(64, 64, generator=g) / 8.0
    tensors["model.vision_embed_tokens.img_projection.2.bias"] = \
        torch.randn(64, generator=g) * 0.1

    d = str(tmp_path_factory.mktemp("phi3v") / "ckpt")
    os.makedirs(d, exist_ok=True)
    save_file(tensors, os.path.join(d, "model.safetensors"))
    cfg = {
        "model_type": "phi3_v", "architectures": ["Phi3VForCausalLM"],
        "vocab_size": V, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 4, "max_position_embeddings": 512,
        "rms_norm_eps": 1e-5, "tie_word_embeddings": False,
        "image_token_index": IMG_TOK, "num_crops": 4,
        "img_processor": {"layer_idx": -2, "type_feature": "patch",
                          "image_dim_out": VC_H},
        "embd_layer": {"embedding_cls": "image",
                       "hd_transform_order": "glb_sub",
                       "use_hd_transform": True,
                       "with_learnable_separator": True},
        "vision_config": {"hidden_size": VC_H, "intermediate_size": 64,
                          "num_hidden_layers": 2, "num_attention_heads": 4,
                          "image_size": S, "patch_size": PATCH},
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    create_tiny_tokenizer(d, vocab_size=V)
    return d


def _golden(phi3v_dir, prompt_ids, pv, max_new):
    """HF-pieces golden over merged inputs_embeds."""
    import torch
    from transformers import (CLIPVisionConfig, CLIPVisionModel, Phi3Config,
                              Phi3ForCausalLM)
    from safetensors.torch import load_file

    t = load_file(os.path.join(phi3v_dir, "model.safetensors"))
    with open(os.path.join(phi3v_dir, "config.json")) as f:
        cfg = json.load(f)
    vc = CLIPVisionConfig(**cfg["vision_config"])
    vision = CLIPVisionModel(vc)
    vision.load_state_dict(
        {k[len("model.vision_embed_tokens.img_processor."):]: v
         for k, v in t.items()
         if k.startswith("model.vision_embed_tokens.img_processor.")})
    vision = vision.to(torch.float32).eval()
    tc = Phi3Config(**{k: cfg[k] for k in (
        "vocab_size", "hidden_size", "intermediate_size",
        "num_hidden_layers", "num_attention_heads", "num_key_value_heads",
        "max_position_embeddings", "rms_norm_eps", "tie_word_embeddings")},
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    text = Phi3ForCausalLM(tc)
    text.load_state_dict({k: v for k, v in t.items()
                          if not k.startswith("model.vision_embed_tokens.")})
    text = text.to(torch.float32).eval()

    half = (S // PATCH) // 2
    C4 = 4 * VC_H
    with torch.no_grad():
        feats = vision(torch.tensor(pv), output_hidden_states=True
                       ).hidden_states[-2][:, 1:]  # [n, g*g, C]
        n = feats.shape[0]
        f = feats.reshape(n, half, 2, half, 2, VC_H).permute(
            0, 1, 3, 2, 4, 5).reshape(n, half, half, C4)
        sub_GN = t["model.vision_embed_tokens.sub_GN"].reshape(C4)
        glb_GN = t["model.vision_embed_tokens.glb_GN"].reshape(C4)
        glb = torch.cat(
            [f[0], sub_GN.expand(half, 1, C4)], dim=1).reshape(-1, C4)
        h, w = 2, 1  # padded 64x32 -> 2x1 crops
        sub = f[1:1 + h * w].reshape(h, w, half, half, C4).permute(
            0, 2, 1, 3, 4).reshape(h * half, w * half, C4)
        sub = torch.cat([sub, sub_GN.expand(h * half, 1, C4)],
                        dim=1).reshape(-1, C4)
        joined = torch.cat([glb, glb_GN[None], sub], dim=0)
        x = joined @ t[
            "model.vision_embed_tokens.img_projection.0.weight"].T + \
            t["model.vision_embed_tokens.img_projection.0.bias"]
        x = torch.nn.functional.gelu(x, approximate="none")
        img_embeds = x @ t[
            "model.vision_embed_tokens.img_projection.2.weight"].T + \
            t["model.vision_embed_tokens.img_projection.2.bias"]

        ids = list(prompt_ids)
        out = []
        for _ in range(max_new):
            emb = text.get_input_embeddings()(torch.tensor(ids))
            img_pos = [i for i, tk in enumerate(ids) if tk == IMG_TOK]
            assert len(img_pos) == img_embeds.shape[0]
            for j, p in enumerate(img_pos):
                emb[p] = img_embeds[j]
            hidden = text.model(inputs_embeds=emb[None]).last_hidden_state
            logits = text.lm_head(hidden)[0, -1]
            tok = int(torch.argmax(logits))
            out.append(tok)
            ids.append(tok)
    return out


def test_phi3v_engine_matches_hf_composed(phi3v_dir):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    rng = np.random.default_rng(5)
    pv = rng.standard_normal((3, 3, S, S)).astype(np.float32)
    # padded image 64x32: global crop + 2 sub crops, 19 image tokens
    n_img_tokens = (2 * 1 + 1) * 4 + 1 + (2 + 1) * 2
    prompt_ids = [1] + [IMG_TOK] * n_img_tokens + [17, 29, 45, 8]
    gold = _golden(phi3v_dir, prompt_ids, pv, 6)

    llm = LLM(model=phi3v_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        detokenize=False)
    mm = {"image": {"pixel_values": pv, "image_sizes": [[64, 32]],
                    "crops_per_image": [3]}}
    outs = llm.generate(prompt_token_ids=[prompt_ids], sampling_params=sp,
                        multi_modal_data=mm, use_tqdm=False)
    assert list(outs[0].outputs[0].token_ids) == gold

    # single-placeholder prompt auto-expands to the same request
    short = [1, IMG_TOK, 17, 29, 45, 8]
    outs2 = llm.generate(prompt_token_ids=[short], sampling_params=sp,
                         multi_modal_data=mm, use_tqdm=False)
    assert list(outs2[0].outputs[0].token_ids) == gold
