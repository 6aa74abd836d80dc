#!/bin/bash
# On-chip serving benchmark through the REAL stack: aiohttp OpenAI
# server + SSE streaming client (reference methodology:
# benchmarks/benchmark_serving.py:46-60). Run on the TPU host.
#
# Usage: benchmarks/run_serving_bench.sh [rate ...]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
MODEL_DIR=${MODEL_DIR:-/tmp/vlt_serve_tinyllama}
PORT=${PORT:-8377}
RATES=${@:-"2 8"}

python benchmarks/prepare_serve_model.py "$MODEL_DIR" >/dev/null

python -m vllm_legacy_tpu.entrypoints.openai.api_server \
  --model "$MODEL_DIR" --load-format dummy --dtype bfloat16 \
  --max-model-len 1024 --max-num-seqs 64 --port "$PORT" \
  --num-scheduler-steps "${SCHED_STEPS:-1}" \
  ${PREWARM:+--prewarm-decode} \
  --disable-log-stats > /tmp/vlt_serve_server.log 2>&1 &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null' EXIT

echo "waiting for server (pid $SERVER_PID) ..."
for i in $(seq 1 600); do
  if curl -fsS "http://localhost:$PORT/health" >/dev/null 2>&1; then
    echo "server up after ${i}s"; break
  fi
  if ! kill -0 $SERVER_PID 2>/dev/null; then
    echo "server died:"; tail -20 /tmp/vlt_serve_server.log; exit 1
  fi
  sleep 1
done

# warm the decode buckets once (compile pass) before measuring
python benchmarks/benchmark_serving.py --model "$MODEL_DIR" \
  --port "$PORT" --num-prompts 8 --input-len 64 --output-len 32 \
  --request-rate inf > /dev/null 2>&1

for rate in $RATES; do
  echo "=== rate=$rate req/s"
  python benchmarks/benchmark_serving.py --model "$MODEL_DIR" \
    --port "$PORT" --num-prompts 64 --input-len 128 --output-len 128 \
    --request-rate "$rate"
done
kill $SERVER_PID 2>/dev/null
wait $SERVER_PID 2>/dev/null
