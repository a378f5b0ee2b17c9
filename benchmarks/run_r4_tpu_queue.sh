#!/bin/bash
# Round-4 TPU work queue (VERDICT r3 #2, #4, #1c + headline refresh).
# Serial on purpose: one chip, one host core. Each leg logs to /tmp and
# keeps going if an earlier leg fails so a transient tunnel drop doesn't
# void the whole queue.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:.

echo "=== leg 1: bench.py headline refresh ==="
timeout 3600 python bench.py > /tmp/r4_bench.log 2>&1
echo "bench exit=$? $(tail -1 /tmp/r4_bench.log)"

echo "=== leg 2: step accounting (full per-op table + buckets + roofline) ==="
timeout 5400 python benchmarks/step_accounting.py > /tmp/r4_step_acct.log 2>&1
echo "step_accounting exit=$?"

echo "=== leg 3: distill step bench at B=256/512/1024 (block routes) ==="
for b in 256 512 1024; do
  timeout 5400 python benchmarks/distill_step_bench.py "$b" > "/tmp/r4_distill_$b.log" 2>&1
  echo "distill B=$b exit=$? $(grep -E 'img/s' /tmp/r4_distill_$b.log | tail -3)"
done

echo "=== leg 4: 2-epoch E2E flagship soak with block routes ==="
timeout 7200 python -m spectre_tpu.repl.train \
  --config spectre_tpu/configs/spectre_vit_cifar100.py \
  --synthetic --set epochs=2 > /tmp/r4_soak.log 2>&1
echo "soak exit=$? $(tail -2 /tmp/r4_soak.log)"

echo "=== queue done ==="
