"""Per-architecture smoke + golden tests (reference tests/models/):
tiny random checkpoints for each family, engine greedy vs HF transformers
argmax agreement."""
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy e2e: full engines / multi-process / model-family goldens


from tests.utils import create_tiny_tokenizer, hf_forward_logits

PROMPTS = [[1, 17, 29, 45, 8, 100], [1, 5, 9]]
MAX_NEW = 6


def _save_tiny(cfg_cls, model_cls, save_dir, **cfg_kwargs):
    import torch
    torch.manual_seed(0)
    cfg = cfg_cls(**cfg_kwargs)
    model = model_cls(cfg).to(torch.float32)
    model.save_pretrained(save_dir, safe_serialization=True)
    create_tiny_tokenizer(save_dir, vocab_size=cfg.vocab_size)
    return save_dir


def _engine_greedy(model_dir, prompts=PROMPTS):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=96, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True)
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_NEW,
                        ignore_eos=True, detokenize=False)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    return [list(o.outputs[0].token_ids) for o in outs]


def _check_vs_hf(model_dir, prompts, generated, tol=2e-3):
    for prompt, gen in zip(prompts, generated):
        seq = list(prompt)
        for tok in gen:
            logits = hf_forward_logits(model_dir, seq)[0, -1]
            hf_top = int(np.argmax(logits))
            assert tok == hf_top or \
                abs(logits[tok] - logits[hf_top]) < tol, \
                (model_dir, tok, hf_top,
                 float(abs(logits[tok] - logits[hf_top])))
            seq.append(tok)


def test_gemma2(tmp_path):
    from transformers import Gemma2Config, Gemma2ForCausalLM
    d = _save_tiny(
        Gemma2Config, Gemma2ForCausalLM, str(tmp_path / "gemma2"),
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, sliding_window=32,
        query_pre_attn_scalar=16, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0)
    gen = _engine_greedy(d)
    _check_vs_hf(d, PROMPTS, gen)


def test_phi3(tmp_path):
    from transformers import Phi3Config, Phi3ForCausalLM
    d = _save_tiny(
        Phi3Config, Phi3ForCausalLM, str(tmp_path / "phi3"),
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, pad_token_id=0, eos_token_id=2,
        bos_token_id=1)
    gen = _engine_greedy(d)
    _check_vs_hf(d, PROMPTS, gen)


def test_qwen2_moe(tmp_path):
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM
    d = _save_tiny(
        Qwen2MoeConfig, Qwen2MoeForCausalLM, str(tmp_path / "qwen2moe"),
        vocab_size=512, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, shared_expert_intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=8, num_experts_per_tok=2, max_position_embeddings=256,
        decoder_sparse_step=1, norm_topk_prob=False, mlp_only_layers=[])
    gen = _engine_greedy(d)
    _check_vs_hf(d, PROMPTS, gen)


def test_deepseek_v2(tmp_path):
    from transformers import AutoModelForCausalLM
    try:
        from transformers import DeepseekV2Config
        from transformers.models.deepseek_v2.modeling_deepseek_v2 import \
            DeepseekV2ForCausalLM
    except ImportError:
        pytest.skip("transformers without DeepseekV2")
    d = _save_tiny(
        DeepseekV2Config, DeepseekV2ForCausalLM,
        str(tmp_path / "deepseek_v2"),
        vocab_size=512, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        n_group=2, topk_group=1, routed_scaling_factor=1.0,
        first_k_dense_replace=1, kv_lora_rank=32, q_lora_rank=24,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        max_position_embeddings=256, norm_topk_prob=False)
    gen = _engine_greedy(d)
    _check_vs_hf(d, PROMPTS, gen)


def test_llama_embedding(tmp_path, tiny_llama_dir):
    """Embeddings mode: LLM.encode pooled hidden == HF last hidden state."""
    import json
    import os
    import shutil
    # re-badge the tiny llama as a bare LlamaModel checkpoint
    d = str(tmp_path / "llama-embed")
    shutil.copytree(tiny_llama_dir, d)
    with open(os.path.join(d, "config.json")) as f:
        cfg = json.load(f)
    cfg["architectures"] = ["LlamaModel"]
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)

    from neural_magic_vllm_tpu import LLM
    llm = LLM(model=d, dtype="float32", max_model_len=128, block_size=16,
              num_gpu_blocks_override=64, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True)
    outs = llm.encode(prompt_token_ids=PROMPTS, use_tqdm=False)
    assert len(outs) == len(PROMPTS)

    import torch
    from transformers import AutoModelForCausalLM
    hf = AutoModelForCausalLM.from_pretrained(tiny_llama_dir,
                                              torch_dtype=torch.float32)
    hf.eval()
    for prompt, out in zip(PROMPTS, outs):
        emb = np.asarray(out.outputs.embedding, np.float32)
        with torch.no_grad():
            hidden = hf.model(
                torch.tensor([prompt])).last_hidden_state[0, -1].numpy()
        np.testing.assert_allclose(emb, hidden, rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("ptype", ["CLS", "ALL"])
def test_llama_embedding_pooling_types(tmp_path, tiny_llama_dir, ptype):
    """Pooling types ALL and CLS (reference PoolingType, pooler.py:56):
    CLS == HF hidden state of token 0; ALL == per-token hidden states.
    Run with chunked prefill so the multi-chunk stash path is exercised."""
    import json
    import os
    import shutil
    d = str(tmp_path / f"llama-embed-{ptype}")
    shutil.copytree(tiny_llama_dir, d)
    with open(os.path.join(d, "config.json")) as f:
        cfg = json.load(f)
    cfg["architectures"] = ["LlamaModel"]
    cfg["pooling_type"] = ptype
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)

    from neural_magic_vllm_tpu import LLM
    llm = LLM(model=d, dtype="float32", max_model_len=128, block_size=16,
              num_gpu_blocks_override=64, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True,
              enable_chunked_prefill=True, max_num_batched_tokens=16)
    outs = llm.encode(prompt_token_ids=PROMPTS, use_tqdm=False)

    import torch
    from transformers import AutoModelForCausalLM
    hf = AutoModelForCausalLM.from_pretrained(tiny_llama_dir,
                                              torch_dtype=torch.float32)
    hf.eval()
    for prompt, out in zip(PROMPTS, outs):
        emb = np.asarray(out.outputs.embedding, np.float32)
        with torch.no_grad():
            hidden = hf.model(torch.tensor([prompt])).last_hidden_state[0]
        if ptype == "CLS":
            np.testing.assert_allclose(emb, hidden[0].numpy(),
                                       rtol=2e-2, atol=2e-3)
        else:
            assert emb.shape == (len(prompt), hidden.shape[1])
            np.testing.assert_allclose(emb, hidden.numpy(),
                                       rtol=2e-2, atol=2e-3)


def test_jamba(tmp_path):
    from transformers import JambaConfig, JambaForCausalLM
    d = _save_tiny(
        JambaConfig, JambaForCausalLM, str(tmp_path / "jamba"),
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        attn_layer_period=2, attn_layer_offset=1,
        expert_layer_period=2, expert_layer_offset=1,
        num_experts=4, num_experts_per_tok=2, use_mamba_kernels=False)
    gen = _engine_greedy(d)
    _check_vs_hf(d, PROMPTS, gen)


def test_jamba_guards(tmp_path):
    """Stateful-model restrictions reject forking and prefix caching."""
    from transformers import JambaConfig, JambaForCausalLM

    from neural_magic_vllm_tpu import LLM, SamplingParams
    d = _save_tiny(
        JambaConfig, JambaForCausalLM, str(tmp_path / "jamba"),
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        attn_layer_period=2, attn_layer_offset=1,
        expert_layer_period=2, expert_layer_offset=1,
        num_experts=1, num_experts_per_tok=1, use_mamba_kernels=False)
    llm = LLM(model=d, dtype="float32", max_model_len=128, block_size=16,
              num_gpu_blocks_override=64, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True)
    with pytest.raises(ValueError, match="stateful"):
        llm.generate(prompt_token_ids=[[1, 5, 9]],
                     sampling_params=SamplingParams(n=2, temperature=0.8,
                                                    max_tokens=4),
                     use_tqdm=False)
    with pytest.raises(NotImplementedError, match="prefix caching"):
        LLM(model=d, dtype="float32", max_model_len=128, block_size=16,
            num_gpu_blocks_override=64, max_num_seqs=8, enforce_eager=True,
            enable_prefix_caching=True, disable_log_stats=True)


def test_jamba_chunked_prefill(tmp_path):
    """Mamba state must thread across prefill chunks: a long prompt split
    into chunks decodes the same greedy tokens as unchunked prefill."""
    from transformers import JambaConfig, JambaForCausalLM

    from neural_magic_vllm_tpu import LLM, SamplingParams
    d = _save_tiny(
        JambaConfig, JambaForCausalLM, str(tmp_path / "jamba"),
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        attn_layer_period=2, attn_layer_offset=1,
        expert_layer_period=2, expert_layer_offset=1,
        num_experts=4, num_experts_per_tok=2, use_mamba_kernels=False)
    rng = np.random.default_rng(9)
    prompts = [[1] + rng.integers(3, 500, 45).tolist(),
               [1] + rng.integers(3, 500, 37).tolist()]
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_NEW,
                        ignore_eos=True, detokenize=False)

    def run(**kw):
        llm = LLM(model=d, dtype="float32", max_model_len=128,
                  block_size=16, num_gpu_blocks_override=96, max_num_seqs=8,
                  enforce_eager=True, disable_log_stats=True, **kw)
        outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                            use_tqdm=False)
        return [list(o.outputs[0].token_ids) for o in outs]

    plain = run()
    chunked = run(enable_chunked_prefill=True, max_num_batched_tokens=16)
    assert plain == chunked


@pytest.mark.parametrize("family", [
    "gpt2", "gpt_bigcode", "opt", "gpt_neox", "gptj", "phi", "stablelm",
    "starcoder2", "olmo"])
def test_gpt_families(tmp_path, family):
    import transformers as tf
    common = dict(vocab_size=512)
    if family == "gpt2":
        cfg_cls, mdl = tf.GPT2Config, tf.GPT2LMHeadModel
        kw = dict(n_embd=64, n_layer=3, n_head=4, n_positions=256)
    elif family == "gpt_bigcode":
        cfg_cls, mdl = tf.GPTBigCodeConfig, tf.GPTBigCodeForCausalLM
        kw = dict(n_embd=64, n_layer=3, n_head=4, n_positions=256,
                  multi_query=True)
    elif family == "opt":
        cfg_cls, mdl = tf.OPTConfig, tf.OPTForCausalLM
        kw = dict(hidden_size=64, num_hidden_layers=3,
                  num_attention_heads=4, ffn_dim=128,
                  max_position_embeddings=256, word_embed_proj_dim=64,
                  do_layer_norm_before=True)
    elif family == "gpt_neox":
        cfg_cls, mdl = tf.GPTNeoXConfig, tf.GPTNeoXForCausalLM
        kw = dict(hidden_size=64, num_hidden_layers=3,
                  num_attention_heads=4, intermediate_size=128,
                  max_position_embeddings=256, rotary_pct=0.25,
                  use_parallel_residual=True)
    elif family == "gptj":
        cfg_cls, mdl = tf.GPTJConfig, tf.GPTJForCausalLM
        kw = dict(n_embd=64, n_layer=3, n_head=4, n_positions=256,
                  rotary_dim=8)
    elif family == "phi":
        cfg_cls, mdl = tf.PhiConfig, tf.PhiForCausalLM
        kw = dict(hidden_size=64, num_hidden_layers=3,
                  num_attention_heads=4, intermediate_size=128,
                  max_position_embeddings=256, partial_rotary_factor=0.5)
    elif family == "stablelm":
        cfg_cls, mdl = tf.StableLmConfig, tf.StableLmForCausalLM
        kw = dict(hidden_size=64, num_hidden_layers=3,
                  num_attention_heads=4, num_key_value_heads=2,
                  intermediate_size=128, max_position_embeddings=256,
                  partial_rotary_factor=0.25, use_qkv_bias=True)
    elif family == "starcoder2":
        cfg_cls, mdl = tf.Starcoder2Config, tf.Starcoder2ForCausalLM
        kw = dict(hidden_size=64, num_hidden_layers=3,
                  num_attention_heads=4, num_key_value_heads=2,
                  intermediate_size=128, max_position_embeddings=256)
    elif family == "olmo":
        cfg_cls, mdl = tf.OlmoConfig, tf.OlmoForCausalLM
        kw = dict(hidden_size=64, num_hidden_layers=3,
                  num_attention_heads=4, intermediate_size=128,
                  max_position_embeddings=256)
    d = _save_tiny(cfg_cls, mdl, str(tmp_path / family), **common, **kw)
    gen = _engine_greedy(d)
    _check_vs_hf(d, PROMPTS, gen)


@pytest.mark.parametrize("variant", ["falcon7b", "falcon40b", "cohere",
                                     "cohere_qk_norm"])
def test_gpt_families_wave2(tmp_path, variant):
    import transformers as tf
    if variant == "falcon7b":
        d = _save_tiny(
            tf.FalconConfig, tf.FalconForCausalLM, str(tmp_path / variant),
            vocab_size=512, hidden_size=64, num_hidden_layers=3,
            num_attention_heads=4, multi_query=True, parallel_attn=True,
            new_decoder_architecture=False, bias=False, alibi=False)
    elif variant == "falcon40b":
        d = _save_tiny(
            tf.FalconConfig, tf.FalconForCausalLM, str(tmp_path / variant),
            vocab_size=512, hidden_size=64, num_hidden_layers=3,
            num_attention_heads=4, num_kv_heads=2,
            new_decoder_architecture=True, bias=False, alibi=False)
    else:
        d = _save_tiny(
            tf.CohereConfig, tf.CohereForCausalLM, str(tmp_path / variant),
            vocab_size=512, hidden_size=64, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=128, max_position_embeddings=256,
            logit_scale=0.5, use_qk_norm=(variant == "cohere_qk_norm"))
    gen = _engine_greedy(d)
    _check_vs_hf(d, PROMPTS, gen)


@pytest.mark.parametrize("variant", ["bloom", "mpt", "mpt_clip",
                                     "falcon_alibi"])
def test_alibi_families(tmp_path, variant):
    import transformers as tf
    if variant == "bloom":
        d = _save_tiny(
            tf.BloomConfig, tf.BloomForCausalLM, str(tmp_path / variant),
            vocab_size=512, hidden_size=64, n_layer=3, n_head=4)
    elif variant in ("mpt", "mpt_clip"):
        attn_config = {"alibi": True, "clip_qkv": None, "qk_ln": False}
        if variant == "mpt_clip":
            attn_config["clip_qkv"] = 4.0
        d = _save_tiny(
            tf.MptConfig, tf.MptForCausalLM, str(tmp_path / variant),
            vocab_size=512, d_model=64, n_layers=3, n_heads=4,
            expansion_ratio=2, max_seq_len=256, no_bias=True,
            attn_config=attn_config)
    else:
        d = _save_tiny(
            tf.FalconConfig, tf.FalconForCausalLM, str(tmp_path / variant),
            vocab_size=512, hidden_size=64, num_hidden_layers=3,
            num_attention_heads=4, multi_query=False, parallel_attn=False,
            new_decoder_architecture=False, bias=True, alibi=True)
    gen = _engine_greedy(d)
    _check_vs_hf(d, PROMPTS, gen)


def test_dbrx(tmp_path):
    from transformers import DbrxConfig, DbrxForCausalLM
    d = _save_tiny(
        DbrxConfig, DbrxForCausalLM, str(tmp_path / "dbrx"),
        vocab_size=512, d_model=64, n_heads=4, n_layers=2, max_seq_len=256,
        attn_config={"kv_n_heads": 2, "clip_qkv": 8.0,
                     "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": 48, "moe_num_experts": 4,
                    "moe_top_k": 2})
    gen = _engine_greedy(d)
    _check_vs_hf(d, PROMPTS, gen)
