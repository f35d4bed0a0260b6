#!/bin/bash
# Round-5 serving campaign: ONE server boot, multiple client rates.
# Usage: bash benchmarks/serve_campaign.sh [extra server args...]
# Env: RATES="2.0:120 8.0:240 1000:400" TRACE=/tmp/step_trace.jsonl
set -u
DIR=~/.cache/nmv_tpu/llama3-8b-serve
PORT=${PORT:-8013}
TRACE=${TRACE:-/tmp/step_trace.jsonl}
LOG=${LOG:-/tmp/serve_campaign_server.log}
RATES=${RATES:-"2.0:120 8.0:240 1000:400"}
rm -f "$TRACE"

NMV_TPU_STEP_TRACE="$TRACE" python -m \
  neural_magic_vllm_tpu.entrypoints.openai.api_server \
  --model "$DIR" --load-format nmv --port $PORT \
  --max-num-seqs ${MAX_SEQS:-256} --num-scheduler-steps ${SCHED_STEPS:-16} \
  --max-model-len 1024 --full-warmup --disable-log-requests \
  --disable-log-stats "$@" > "$LOG" 2>&1 &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null' EXIT

for i in $(seq 1 400); do
  sleep 4
  if curl -s -o /dev/null "http://localhost:$PORT/health"; then break; fi
  if ! kill -0 $SERVER_PID 2>/dev/null; then
    echo "server died:"; tail -5 "$LOG"; exit 1
  fi
done
if ! curl -s -o /dev/null "http://localhost:$PORT/health"; then
  echo "server never came up (warmup still running after wait budget):"
  tail -3 "$LOG"; exit 1
fi
echo "server up after warmup: $(grep -c 'Warmup' "$LOG") warmup lines"
grep "Warmup done" "$LOG" || true

for rn in $RATES; do
  RATE="${rn%%:*}"; N="${rn##*:}"
  echo "=== rate=$RATE n=$N ==="
  python benchmarks/benchmark_serving.py \
    --base-url "http://localhost:$PORT" --model "$DIR" \
    --num-prompts "$N" --request-rate "$RATE" ${CLIENT_ARGS:-}
done

kill $SERVER_PID 2>/dev/null; wait $SERVER_PID 2>/dev/null
python - "$TRACE" <<'EOF'
import json, sys
import numpy as np
rows = [json.loads(l) for l in open(sys.argv[1])]
dec = [r for r in rows if r["n_decode"] > 0 and r["n_prefill"] == 0]
mix = [r for r in rows if r["n_prefill"] > 0 and r["n_decode"] > 0]
pre = [r for r in rows if r["n_prefill"] > 0 and r["n_decode"] == 0]
print(f"steps: {len(rows)} decode-only {len(dec)} MIXED {len(mix)} "
      f"prefill-only {len(pre)}")
for name, part in (("decode", dec), ("mixed", mix), ("prefill", pre)):
    if not part: continue
    for k in ("sched_ms", "dispatch_ms", "outproc_ms"):
        v = np.array([r[k] for r in part])
        print(f"{name} {k}: sum {v.sum()/1e3:.1f}s p50 "
              f"{np.percentile(v,50):.1f}ms p99 {np.percentile(v,99):.1f}ms")
tot_wall = sum(r["sched_ms"]+r["dispatch_ms"]+r["outproc_ms"]
               for r in rows)/1e3
dev_tok = sum(r["n_decode"]*r["fused_steps"] for r in rows)
pre_tok = sum(r["prefill_tokens"] for r in rows)
print(f"wall {tot_wall:.1f}s decode-tokens {dev_tok} "
      f"prefill-tokens {pre_tok} -> engine out-tok/s "
      f"{dev_tok/max(tot_wall,1e-9):.0f}")
EOF
