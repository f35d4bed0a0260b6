"""Shared test helpers: tiny local HF checkpoints + tokenizers built offline
(no network egress in CI)."""
import json
import os
from typing import Optional

import numpy as np


def create_tiny_tokenizer(save_dir: str, vocab_size: int = 512) -> None:
    """Build a byte-level WordPiece-free tokenizer entirely offline using the
    `tokenizers` library and save it in HF fast-tokenizer format."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders
    # Byte-level BPE with no merges: every byte is a token.
    vocab = {}
    from tokenizers.pre_tokenizers import ByteLevel
    alphabet = ByteLevel.alphabet()
    vocab["<unk>"] = 0
    vocab["<s>"] = 1
    vocab["</s>"] = 2
    for i, ch in enumerate(sorted(alphabet)):
        vocab[ch] = i + 3
    idx = len(vocab)
    while idx < vocab_size:
        vocab[f"<extra_{idx}>"] = idx
        idx += 1
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    os.makedirs(save_dir, exist_ok=True)
    tok.save(os.path.join(save_dir, "tokenizer.json"))
    with open(os.path.join(save_dir, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "bos_token": "<s>",
                "eos_token": "</s>",
                "unk_token": "<unk>",
                "model_max_length": 2048,
            }, f)
    with open(os.path.join(save_dir, "special_tokens_map.json"), "w") as f:
        json.dump({
            "bos_token": "<s>",
            "eos_token": "</s>",
            "unk_token": "<unk>"
        }, f)


def create_tiny_llama_checkpoint(
    save_dir: str,
    *,
    vocab_size: int = 512,
    hidden_size: int = 64,
    intermediate_size: int = 128,
    num_hidden_layers: int = 2,
    num_attention_heads: int = 4,
    num_key_value_heads: int = 2,
    max_position_embeddings: int = 512,
    seed: int = 0,
    dtype: str = "float32",
) -> str:
    """Create and save a tiny random LlamaForCausalLM + byte tokenizer."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    cfg = LlamaConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=num_attention_heads,
        num_key_value_heads=num_key_value_heads,
        max_position_embeddings=max_position_embeddings,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        torch_dtype=dtype,
    )
    model = LlamaForCausalLM(cfg)
    model = model.to(getattr(torch, dtype))
    os.makedirs(save_dir, exist_ok=True)
    model.save_pretrained(save_dir, safe_serialization=True)
    create_tiny_tokenizer(save_dir, vocab_size=vocab_size)
    return save_dir


def create_tiny_mixtral_checkpoint(
    save_dir: str,
    *,
    vocab_size: int = 512,
    hidden_size: int = 64,
    intermediate_size: int = 128,
    num_hidden_layers: int = 2,
    num_attention_heads: int = 4,
    num_key_value_heads: int = 2,
    num_local_experts: int = 4,
    num_experts_per_tok: int = 2,
    seed: int = 0,
) -> str:
    """Create and save a tiny random MixtralForCausalLM + byte tokenizer."""
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(seed)
    cfg = MixtralConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=num_attention_heads,
        num_key_value_heads=num_key_value_heads,
        num_local_experts=num_local_experts,
        num_experts_per_tok=num_experts_per_tok,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    model = MixtralForCausalLM(cfg).to(torch.float32)
    os.makedirs(save_dir, exist_ok=True)
    model.save_pretrained(save_dir, safe_serialization=True)
    create_tiny_tokenizer(save_dir, vocab_size=vocab_size)
    return save_dir


def create_tiny_llava_checkpoint(
    save_dir: str,
    *,
    vocab_size: int = 512,
    hidden_size: int = 64,
    intermediate_size: int = 128,
    num_hidden_layers: int = 2,
    vision_hidden_size: int = 32,
    vision_layers: int = 2,
    image_size: int = 28,
    patch_size: int = 14,
    image_token_index: int = 32,
    seed: int = 0,
) -> str:
    """Create and save a tiny random LlavaForConditionalGeneration."""
    import torch
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)

    torch.manual_seed(seed)
    vc = CLIPVisionConfig(hidden_size=vision_hidden_size,
                          intermediate_size=vision_hidden_size * 2,
                          num_hidden_layers=vision_layers,
                          num_attention_heads=4,
                          image_size=image_size,
                          patch_size=patch_size)
    tc = LlamaConfig(vocab_size=vocab_size,
                     hidden_size=hidden_size,
                     intermediate_size=intermediate_size,
                     num_hidden_layers=num_hidden_layers,
                     num_attention_heads=4,
                     num_key_value_heads=2,
                     max_position_embeddings=512,
                     rms_norm_eps=1e-5,
                     tie_word_embeddings=False)
    cfg = LlavaConfig(vision_config=vc, text_config=tc,
                      image_token_index=image_token_index,
                      vision_feature_layer=-2,
                      vision_feature_select_strategy="default",
                      torch_dtype="float32")
    model = LlavaForConditionalGeneration(cfg).to(torch.float32)
    os.makedirs(save_dir, exist_ok=True)
    model.save_pretrained(save_dir, safe_serialization=True)
    create_tiny_tokenizer(save_dir, vocab_size=vocab_size)
    return save_dir


def hf_greedy_generate(model_dir: str, prompt_token_ids, max_new_tokens: int):
    """HF transformers golden: greedy generation returning token ids."""
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_dir,
                                                 torch_dtype=torch.float32)
    model.eval()
    out = []
    with torch.no_grad():
        for ids in prompt_token_ids:
            input_ids = torch.tensor([ids], dtype=torch.long)
            gen = model.generate(input_ids,
                                 max_new_tokens=max_new_tokens,
                                 do_sample=False,
                                 num_beams=1,
                                 pad_token_id=0)
            out.append(gen[0][len(ids):].tolist())
    return out


def hf_forward_logits(model_dir: str, token_ids):
    """HF transformers golden: full-sequence logits [1, S, V] (numpy)."""
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_dir,
                                                 torch_dtype=torch.float32)
    model.eval()
    with torch.no_grad():
        input_ids = torch.tensor([token_ids], dtype=torch.long)
        logits = model(input_ids).logits
    return logits.float().numpy()


def quantize_llama_checkpoint_gptq(src_dir: str, quant_dir: str,
                                   dense_dir: str, *, bits: int = 4,
                                   group_size: int = 32,
                                   asym: bool = False,
                                   extra_suffixes: tuple = ()) -> None:
    """Quantize a dense Llama checkpoint's linear weights to GPTQ format
    (qweight/qzeros/scales words), writing BOTH the quantized checkpoint and
    its exactly-dequantized dense twin — greedy decode through the engine
    must match between the two."""
    import shutil
    from safetensors.numpy import load_file, save_file

    pf = 32 // bits
    sym_zero = 1 << (bits - 1)
    os.makedirs(quant_dir, exist_ok=True)
    os.makedirs(dense_dir, exist_ok=True)

    st_files = [f for f in os.listdir(src_dir) if f.endswith(".safetensors")]
    assert len(st_files) == 1, st_files
    tensors = load_file(os.path.join(src_dir, st_files[0]))

    linear_suffixes = ("q_proj.weight", "k_proj.weight", "v_proj.weight",
                       "o_proj.weight", "gate_proj.weight", "up_proj.weight",
                       "down_proj.weight") + tuple(extra_suffixes)
    rng = np.random.default_rng(7)
    quant_out, dense_out = {}, {}
    for name, w in tensors.items():
        if not name.endswith(linear_suffixes):
            quant_out[name] = w
            dense_out[name] = w
            continue
        wt = np.asarray(w, np.float32).T  # [K, N]
        K, N = wt.shape
        gs = K if group_size in (-1, None) else group_size
        G = K // gs
        wg = wt.reshape(G, gs, N)
        if asym:
            wmin, wmax = wg.min(axis=1), wg.max(axis=1)  # [G, N]
            scales = np.maximum((wmax - wmin) / (2**bits - 1), 1e-8)
            zeros = np.clip(np.round(-wmin / scales), 0, 2**bits - 1)
        else:
            amax = np.abs(wg).max(axis=1)
            scales = np.maximum(amax / (sym_zero - 1), 1e-8)
            zeros = np.full((G, N), float(sym_zero), np.float32)
        q = np.clip(np.round(wg / scales[:, None, :]) + zeros[:, None, :],
                    0, 2**bits - 1).astype(np.uint32).reshape(K, N)
        wdq = ((q.reshape(G, gs, N) - zeros[:, None, :]) *
               scales[:, None, :]).reshape(K, N)

        qweight = np.zeros((K // pf, N), np.uint32)
        for i in range(pf):
            qweight |= q[i::pf] << (bits * i)
        qzeros = np.zeros((G, N // pf), np.uint32)
        zi = zeros.astype(np.uint32)
        mask = (1 << bits) - 1
        for i in range(pf):
            qzeros |= ((zi[:, i::pf] - 1) & mask) << (bits * i)

        base = name[:-len(".weight")]
        quant_out[base + ".qweight"] = qweight.view(np.int32)
        quant_out[base + ".qzeros"] = qzeros.view(np.int32)
        quant_out[base + ".scales"] = scales.astype(np.float16)
        quant_out[base + ".g_idx"] = (np.arange(K) // gs).astype(np.int32)
        dense_out[name] = wdq.T.astype(w.dtype)

    # safetensors serializes the raw buffer: force C order (F-ordered
    # arrays — e.g. numpy reductions over transposed views — silently
    # round-trip transposed otherwise).
    quant_out = {k: np.ascontiguousarray(v) for k, v in quant_out.items()}
    dense_out = {k: np.ascontiguousarray(v) for k, v in dense_out.items()}
    save_file(quant_out, os.path.join(quant_dir, "model.safetensors"))
    save_file(dense_out, os.path.join(dense_dir, "model.safetensors"))
    for d in (quant_dir, dense_dir):
        for f in os.listdir(src_dir):
            if f.endswith(".json") and "index" not in f:
                shutil.copy(os.path.join(src_dir, f), os.path.join(d, f))
    # add quantization_config to the quant checkpoint's config.json
    cfg_path = os.path.join(quant_dir, "config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["quantization_config"] = {
        "quant_method": "gptq",
        "bits": bits,
        "group_size": group_size,
        "desc_act": False,
        "sym": not asym,
    }
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
