#!/bin/bash
# Saturated-serving probe: start the OpenAI server on the prepared 8B
# W4A16 dir with the per-step trace enabled, saturate it, then decompose
# where the step time goes (sched / dispatch / outproc) from the trace.
#
# Usage: bash benchmarks/serve_probe.sh [rate] [nprompts] [extra server args...]
set -u
RATE=${1:-1000}
NPROMPTS=${2:-400}
shift 2 2>/dev/null || true
DIR=~/.cache/nmv_tpu/llama3-8b-serve
PORT=8013
TRACE=${TRACE:-/tmp/step_trace.jsonl}
LOG=${LOG:-/tmp/serve_probe_server.log}
rm -f "$TRACE"

NMV_TPU_STEP_TRACE="$TRACE" python -m \
  neural_magic_vllm_tpu.entrypoints.openai.api_server \
  --model "$DIR" --load-format nmv --port $PORT \
  --max-num-seqs ${MAX_SEQS:-256} --num-scheduler-steps ${SCHED_STEPS:-16} \
  --max-model-len 1024 --full-warmup --disable-log-requests \
  --disable-log-stats "$@" > "$LOG" 2>&1 &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null' EXIT

for i in $(seq 1 150); do
  sleep 4
  if curl -s -o /dev/null "http://localhost:$PORT/health"; then break; fi
  if ! kill -0 $SERVER_PID 2>/dev/null; then
    echo "server died:"; tail -5 "$LOG"; exit 1
  fi
done

python benchmarks/benchmark_serving.py --base-url "http://localhost:$PORT" \
  --model "$DIR" --num-prompts "$NPROMPTS" --request-rate "$RATE" \
  ${CLIENT_ARGS:-}

kill $SERVER_PID 2>/dev/null; wait $SERVER_PID 2>/dev/null
python - "$TRACE" <<'EOF'
import json, sys
import numpy as np
rows = [json.loads(l) for l in open(sys.argv[1])]
dec = [r for r in rows if r["n_decode"] > 0 and r["n_prefill"] == 0]
pre = [r for r in rows if r["n_prefill"] > 0]
def s(rows, k):
    v = np.array([r[k] for r in rows])
    return f"{k}: sum {v.sum()/1e3:.1f}s p50 {np.percentile(v,50):.1f}ms p99 {np.percentile(v,99):.1f}ms"
print(f"steps: {len(rows)} decode-only {len(dec)} prefill {len(pre)}")
for k in ("sched_ms", "dispatch_ms", "outproc_ms"):
    if dec: print("decode", s(dec, k))
for k in ("sched_ms", "dispatch_ms", "outproc_ms"):
    if pre: print("prefill", s(pre, k))
if dec:
    nd = np.array([r["n_decode"] for r in dec])
    fs = np.array([r["fused_steps"] for r in dec])
    tot = np.array([r["sched_ms"]+r["dispatch_ms"]+r["outproc_ms"] for r in dec])
    print(f"decode bucket mean {nd.mean():.0f} fused_steps mean {fs.mean():.1f}")
    print(f"decode step wall sum {tot.sum()/1e3:.1f}s; device-tokens/s "
          f"{(nd*fs).sum()/ (tot.sum()/1e3):.0f}")
EOF
