"""Online serving benchmark (role of reference
benchmarks/benchmark_serving.py): drives a running OpenAI-compatible server
with Poisson arrivals and streaming requests; reports TTFT / TPOT / ITL and
throughput percentiles. Prompt/output lengths are sampled synthetically
(ShareGPT-like lognormal mix) since this environment has no dataset egress;
pass --input-len/--output-len for fixed lengths.

Usage: python benchmarks/benchmark_serving.py --base-url http://localhost:8000 \
    --model <served-name> --num-prompts 100 --request-rate 2.0
"""
import argparse
import asyncio
import json
import time
from dataclasses import dataclass, field
from typing import List, Optional

import aiohttp
import numpy as np


@dataclass
class RequestResult:
    success: bool = False
    ttft_s: float = 0.0
    latency_s: float = 0.0
    itl_s: List[float] = field(default_factory=list)  # inter-CHUNK gaps
    output_tokens: int = 0
    chunks: int = 0


async def one_request(session: aiohttp.ClientSession, url: str, model: str,
                      prompt: str, output_len: int) -> RequestResult:
    """One streamed completion. With multi-step scheduling the server
    legitimately emits several tokens per SSE chunk (as the reference does
    at num_scheduler_steps > 1), so output_tokens comes from the final
    usage frame (stream_options.include_usage), NOT from counting chunks —
    counting chunks undercounted 16x at num-scheduler-steps 16 and
    poisoned every round-2/3 throughput figure at high K."""
    payload = {
        "model": model,
        "prompt": prompt,
        "max_tokens": output_len,
        "temperature": 0.0,
        "ignore_eos": True,
        "stream": True,
        "stream_options": {"include_usage": True},
    }
    result = RequestResult()
    start = time.perf_counter()
    last = start
    try:
        async with session.post(url, json=payload) as resp:
            if resp.status != 200:
                return result
            async for raw in resp.content:
                line = raw.decode().strip()
                if not line.startswith("data: ") or line.endswith("[DONE]"):
                    continue
                try:
                    obj = json.loads(line[len("data: "):])
                except json.JSONDecodeError:
                    continue
                usage = obj.get("usage")
                if usage and usage.get("completion_tokens"):
                    result.output_tokens = usage["completion_tokens"]
                if not obj.get("choices"):
                    continue
                now = time.perf_counter()
                if result.chunks == 0:
                    result.ttft_s = now - start
                else:
                    result.itl_s.append(now - last)
                last = now
                result.chunks += 1
        result.latency_s = time.perf_counter() - start
        if result.output_tokens == 0:
            result.output_tokens = result.chunks  # server without usage
        result.success = result.output_tokens > 0
    except aiohttp.ClientError:
        pass
    return result


def sample_lengths(rng, n, input_len, output_len):
    if input_len:
        return [(input_len, output_len)] * n
    ins = np.clip(rng.lognormal(5.0, 0.8, n), 8, 1024).astype(int)
    outs = np.clip(rng.lognormal(4.5, 0.7, n), 8, 512).astype(int)
    return list(zip(ins.tolist(), outs.tolist()))


async def run(args) -> None:
    rng = np.random.default_rng(args.seed)
    lengths = sample_lengths(rng, args.num_prompts, args.input_len,
                             args.output_len)
    url = f"{args.base_url}/v1/completions"

    # limit=0: aiohttp's default 100-connection cap silently throttles
    # saturation runs (the server never sees more than 100 concurrent)
    async with aiohttp.ClientSession(
            connector=aiohttp.TCPConnector(limit=0),
            timeout=aiohttp.ClientTimeout(total=6 * 3600)) as session:
        # calibrate tokens-per-word against the server's own tokenizer so
        # prompt token counts land on target regardless of vocabulary
        # (a byte-level fallback tokenizer yields ~6 tokens per "hello ")
        tok_per_word = 2.0
        try:
            async with session.post(f"{args.base_url}/tokenize",
                                    json={"prompt": "hello " * 8}) as r:
                if r.status == 200:
                    n = len((await r.json()).get("tokens", []))
                    if n:
                        tok_per_word = max(n / 8.0, 0.25)
        except aiohttp.ClientError:
            pass
        lengths = [(min(in_len, args.max_input_len),
                    max(min(out_len, args.max_total_len -
                            min(in_len, args.max_input_len)), 1))
                   for in_len, out_len in lengths]
        prompts = [("hello " * max(int(in_len / tok_per_word), 1)).strip()
                   for in_len, _ in lengths]
        tasks = []
        start = time.perf_counter()
        for i, (prompt, (_, out_len)) in enumerate(zip(prompts, lengths)):
            tasks.append(asyncio.create_task(
                one_request(session, url, args.model, prompt, out_len)))
            if args.request_rate != float("inf"):
                await asyncio.sleep(rng.exponential(1.0 /
                                                    args.request_rate))
        results: List[RequestResult] = await asyncio.gather(*tasks)
        wall = time.perf_counter() - start

    ok = [r for r in results if r.success]
    if not ok:
        print(json.dumps({"error": "no successful requests"}))
        return
    ttfts = np.array([r.ttft_s for r in ok])
    itls = np.array([x for r in ok for x in r.itl_s] or [0.0])
    lats = np.array([r.latency_s for r in ok])
    # TPOT (reference benchmark_serving.py:54-70): per-request decode
    # time per output token, excluding the first token
    tpots = np.array([(r.latency_s - r.ttft_s) / (r.output_tokens - 1)
                      for r in ok if r.output_tokens > 1] or [0.0])
    total_out = sum(r.output_tokens for r in ok)
    pct = lambda a, p: round(float(np.percentile(a, p)) * 1e3, 1)
    print(json.dumps({
        "completed": len(ok),
        "duration_s": round(wall, 2),
        "request_throughput_rps": round(len(ok) / wall, 3),
        "output_token_throughput_tps": round(total_out / wall, 1),
        "mean_ttft_ms": round(float(ttfts.mean()) * 1e3, 1),
        "p50_ttft_ms": pct(ttfts, 50), "p99_ttft_ms": pct(ttfts, 99),
        "mean_tpot_ms": round(float(tpots.mean()) * 1e3, 1),
        "p50_tpot_ms": pct(tpots, 50), "p99_tpot_ms": pct(tpots, 99),
        "mean_itl_ms": round(float(itls.mean()) * 1e3, 1),
        "p50_itl_ms": pct(itls, 50), "p99_itl_ms": pct(itls, 99),
        "p50_e2e_ms": pct(lats, 50), "p99_e2e_ms": pct(lats, 99),
    }))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-url", type=str,
                        default="http://localhost:8000")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--num-prompts", type=int, default=100)
    parser.add_argument("--request-rate", type=float, default=float("inf"))
    parser.add_argument("--max-total-len", type=int, default=1000,
                        help="clamp prompt+output token budget per "
                             "request (keep <= the server's "
                             "max_model_len)")
    parser.add_argument("--max-input-len", type=int, default=896,
                        help="clamp sampled prompt token lengths (keep "
                             "under the server's max_model_len minus "
                             "output budget)")
    parser.add_argument("--input-len", type=int, default=0,
                        help="0 = synthetic ShareGPT-like mix")
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--seed", type=int, default=0)
    asyncio.run(run(parser.parse_args()))
