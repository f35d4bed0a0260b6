"""Perplexity evaluation through the engine (role of the reference's
lm-eval GSM8K accuracy harness, tests/accuracy/ — this environment has no
dataset/model egress, so the recorded metric is wikitext-style perplexity
over a local text file, computed from the engine's prompt_logprobs and
directly comparable to a HF transformers run of the same checkpoint).

python benchmarks/eval_ppl.py --model <dir> --text-file wiki.txt \
    [--stride 512] [--compare-hf]
"""
import argparse
import json
import math


def engine_ppl(model_dir: str, token_ids, max_len: int, stride: int):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=model_dir, max_model_len=max_len, enforce_eager=True,
              disable_log_stats=True)
    sp = SamplingParams(temperature=0.0, max_tokens=1,
                        prompt_logprobs=0, detokenize=False)
    nll, count = 0.0, 0
    chunks = [token_ids[i:i + stride]
              for i in range(0, len(token_ids) - 1, stride)]
    chunks = [c for c in chunks if len(c) >= 2]
    outs = llm.generate(prompt_token_ids=chunks, sampling_params=sp,
                        use_tqdm=False)
    for chunk, out in zip(chunks, outs):
        assert out.prompt_logprobs is not None
        for tok, lp in zip(chunk[1:], out.prompt_logprobs[1:]):
            nll -= lp[tok].logprob
            count += 1
    return math.exp(nll / max(count, 1)), count


def hf_ppl(model_dir: str, token_ids, stride: int):
    import torch
    from transformers import AutoModelForCausalLM
    model = AutoModelForCausalLM.from_pretrained(model_dir,
                                                 torch_dtype=torch.float32)
    model.eval()
    nll, count = 0.0, 0
    with torch.no_grad():
        for i in range(0, len(token_ids) - 1, stride):
            chunk = token_ids[i:i + stride]
            if len(chunk) < 2:
                continue
            ids = torch.tensor([chunk])
            logits = model(ids).logits[0]
            logprobs = torch.log_softmax(logits.float(), dim=-1)
            for j in range(1, len(chunk)):
                nll -= float(logprobs[j - 1, chunk[j]])
                count += 1
    return math.exp(nll / max(count, 1)), count


def main(args):
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(args.model)
    with open(args.text_file) as f:
        text = f.read()
    ids = tok.encode(text)[:args.max_tokens]
    ppl, n = engine_ppl(args.model, ids, args.max_model_len, args.stride)
    result = {"engine_ppl": round(ppl, 4), "tokens": n}
    if args.compare_hf:
        hppl, _ = hf_ppl(args.model, ids, args.stride)
        result["hf_ppl"] = round(hppl, 4)
        result["rel_delta"] = round(abs(ppl - hppl) / hppl, 5)
    print(json.dumps(result))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--text-file", required=True)
    p.add_argument("--stride", type=int, default=512)
    p.add_argument("--max-model-len", type=int, default=1024)
    p.add_argument("--max-tokens", type=int, default=8192)
    p.add_argument("--compare-hf", action="store_true")
    main(p.parse_args())
