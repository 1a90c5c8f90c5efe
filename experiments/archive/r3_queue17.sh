#!/bin/bash
# Round-3 TPU queue, part 17 (gated on queue16): restore the medium h1
# flagship artifact + final size table.
#  M4_gde_medium_h1 — retrain the reference-recipe (h=1) medium GDE, whose
#                     round-3 checkpoint was lost to a VM reset (200
#                     epochs, ~65 min; scan_chunk for dispatch bounding).
#  M5_gde_medium_h1_ms — its multistep row (refreshes runs/.../multistep.json
#                     used by scripts/multistep_table.py).
#  M6_export_gde_h1 — committable serving blob (CPU, horizon 1).
#  Z_size_sweep     — per-size throughput table at best-known batches
#                     (+ knee probes for medium-10 and large at 2048).
#  Z2_parity        — 30-episode medium parity stats (bench claims require
#                     "PARITY.md stats unchanged").
#  X_bench4         — bench preflight last.
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
HARD_DEADLINE=$(date -ud "2026-08-19 07:45" +%s)

stage() {
  local name=$1; shift
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  if [ -f /tmp/r3_queue17_stop ] || [ "$budget" -le 60 ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop/deadline)" >> /tmp/r3_queue.log
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name (budget ${budget}s): $*" >> /tmp/r3_queue.log
  timeout -s TERM "$budget" "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> /tmp/r3_queue.log
}

Q16PID=$(cat /tmp/r3_queue16.pid 2>/dev/null)
if [ -n "$Q16PID" ]; then
  while kill -0 "$Q16PID" 2>/dev/null; do sleep 30; done
fi
echo "=== $(date -u +%H:%M:%S) queue17 start (queue16 drained)" >> /tmp/r3_queue.log

for a in 1 2; do
  stage M4_gde_medium_h1_b$a python3 experiments/medium_gde_ref_scale.py \
    --env tarware-medium-19agvs-9pickers-partialobs-v1 \
    --epochs 200 --horizon 1 --checkpoint_every 5 --scan_chunk 3000
  if grep -q "best val" "/tmp/r3_M4_gde_medium_h1_b$a.log" 2>/dev/null; then
    break
  fi
done

stage M5_gde_medium_h1_ms python3 experiments/gde_multistep.py \
  --env tarware-medium-19agvs-9pickers-partialobs-v1 \
  --run_dir /root/repo/runs/gde_medium_ref

stage M6_export_gde_h1 python3 experiments/export_gde.py \
  --cpu \
  --ckpt runs/gde_medium_ref/ckpt \
  --env tarware-medium-19agvs-9pickers-partialobs-v1 \
  --horizon 1 --out results_data/gde_medium_h1.stablehlo

stage Z_size_sweep python3 experiments/size_sweep.py

stage Z2_parity python3 scripts/eval_parity.py

stage X_bench4 python3 bench.py

echo "=== $(date -u +%H:%M:%S) queue17 done" >> /tmp/r3_queue.log
