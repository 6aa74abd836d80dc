#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
for DT in fp8 bf16; do
  echo "=== DT=$DT"
  DT=$DT B=32 CTX=512 BLOCK_SIZE=64 PAIR=0 D=128 HKV=40 HQ=40 LNUM=20 \
    python benchmarks/micro/fused_decode_bench.py 2>&1 | grep -E "attn22|AOT PJRT error" | head -2
done
