#!/bin/bash
# Pending TPU measurements queue — run once the axon tunnel is back.
# Usage: bash scripts/tpu_queue.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_queue_$(date +%H%M)}
mkdir -p "$OUT"
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

echo "=== 0. fused SNAG loss bundle: value + A/B (never TPU-run) ==="
python scripts/check_snag_bundle_tpu.py 2>&1 | tee "$OUT/check_bundle.log"

echo "=== 0b. bidirectional GAT backward: grads + A/B (rewrite never TPU-run) ==="
python scripts/check_gat_bwd_tpu.py 2>&1 | tee "$OUT/check_gat_bwd.log"

echo "=== 1. tiny-attn + QKV-fold A/B (bench geometry) ==="
python scripts/ab_tiny_attn.py 2>&1 | tee "$OUT/ab_tiny_attn.log"

echo "=== 2. bench.py (headline) ==="
python bench.py 2>&1 | tee "$OUT/bench.log"

echo "=== 3. 100K-scale check ==="
python scripts/bench_100k.py 2>&1 | tee "$OUT/bench_100k.log"

echo "=== 4. 100K tile-structure tuning sweep ==="
python scripts/tune_100k.py 2>&1 | tee "$OUT/tune_100k.log"

echo "=== done; logs in $OUT ==="

echo "=== 5. fresh step trace + attribution (post GAT-bwd/loss-bundle) ==="
python scripts/trace_step.py 2>&1 | tee "$OUT/trace.log" || true
python scripts/attribute_trace.py 2>&1 | tee "$OUT/attribution.log" || true
