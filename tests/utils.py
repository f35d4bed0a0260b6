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
