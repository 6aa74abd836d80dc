#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
for DT in bf16 fp8; do
  echo "=== DT=$DT 13B shapes ==="
  DT=$DT B=64 CTX=512 BLOCK_SIZE=64 PAIR=0 D=128 HKV=40 HQ=40 LNUM=40 \
    python benchmarks/micro/fused_decode_bench.py
done
