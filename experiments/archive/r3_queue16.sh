#!/bin/bash
# Round-3 TPU queue, part 16 (gated on queue15): committable serving
# artifacts + restore the wiped medium flagship.
#  W2_export_coordtrain20k — serving blob of the 20k coordinated-training
#                            QMIX policy (the first learned >=100-greedy
#                            dispatcher) into results_data/ (committed;
#                            runs/ is wiped by VM resets).
#  W3_export_gde_large     — serving blob of the trained large GDE h4.
#  M_gde_medium_h4         — retrain medium h4 (the round-3 checkpoint was
#                            lost to a VM reset; the committed table was
#                            evaluated at ckpt step 50 of a wedge-cut run,
#                            so a clean 100-epoch run may improve it).
#                            scan_chunk bounds dispatches (crash fix).
#  M2_gde_medium_ms        — refresh the medium multistep table.
#  M3_export_gde_medium    — medium GDE h4 serving blob.
#  X_bench3                — bench preflight last.
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
HARD_DEADLINE=$(date -ud "2026-08-19 07:45" +%s)

stage() {
  local name=$1; shift
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  if [ -f /tmp/r3_queue16_stop ] || [ "$budget" -le 60 ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop/deadline)" >> /tmp/r3_queue.log
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name (budget ${budget}s): $*" >> /tmp/r3_queue.log
  timeout -s TERM "$budget" "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> /tmp/r3_queue.log
}

Q15PID=$(cat /tmp/r3_queue15.pid 2>/dev/null)
if [ -n "$Q15PID" ]; then
  while kill -0 "$Q15PID" 2>/dev/null; do sleep 30; done
fi
echo "=== $(date -u +%H:%M:%S) queue16 start (queue15 drained)" >> /tmp/r3_queue.log

stage W2_export_coordtrain20k python3 experiments/export_policy.py \
  --cpu \
  --ckpt runs/qmix_medium_5k_coordtrain/ckpt --kind qmix \
  --env_id tarware-medium-19agvs-9pickers-partialobs-v1 \
  --net gnode --hidden_dim 64 --coordinated \
  --out results_data/policy_qmix_coordtrain20k.stablehlo

stage W3_export_gde_large python3 experiments/export_gde.py \
  --cpu \
  --ckpt runs/gde_large_ref_h4/ckpt \
  --env tarware-large-15agvs-8pickers-partialobs-v1 \
  --horizon 4 --out results_data/gde_large_h4.stablehlo

stage M_gde_medium_h4 python3 experiments/medium_gde_ref_scale.py \
  --env tarware-medium-19agvs-9pickers-partialobs-v1 \
  --epochs 100 --horizon 4 --tag h4 --checkpoint_every 2 --scan_chunk 2000

stage M2_gde_medium_ms python3 experiments/gde_multistep.py \
  --env tarware-medium-19agvs-9pickers-partialobs-v1 \
  --run_dir /root/repo/runs/gde_medium_ref_h4

stage M3_export_gde_medium python3 experiments/export_gde.py \
  --cpu \
  --ckpt runs/gde_medium_ref_h4/ckpt \
  --env tarware-medium-19agvs-9pickers-partialobs-v1 \
  --horizon 4 --out results_data/gde_medium_h4.stablehlo

stage X_bench3 python3 bench.py

echo "=== $(date -u +%H:%M:%S) queue16 done" >> /tmp/r3_queue.log
