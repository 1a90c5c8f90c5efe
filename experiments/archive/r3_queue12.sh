#!/bin/bash
# Round-3 TPU queue, part 12 (gated on queue11 draining).
#
# Re-prioritization after the 14:11 TPU-worker crash killed the large
# GDE run (runs/gde_large_ref_h4/ckpt empty): the stop file drains
# queue10's remaining re-verification stages (medium DAgger/paired
# re-runs, MAPPO bonuses — the medium clone results are already
# committed in results_data/) and queue11, and this queue spends the
# chip on the still-open VERDICT items instead:
#   1. large GDE h4 at reference scale, retried with checkpoint_every=2
#      + auto-resume (two prior attempts died to TPU-client wedges),
#   2. the large multistep tables (GDE + baselines),
#   3. coordinated-operator eval of the large QMIX checkpoint (its
#      greedy probe is argmax-degenerate: 44.6 -> 0.0 across training),
#   4. queue11's coordinated-training QMIX question (budget-capped),
#   5. blob re-export + bench preflight (last, so a wedge cannot strand
#      the driver's end-of-round bench).
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
LARGE=tarware-large-15agvs-8pickers-partialobs-v1
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
SOFT_DEADLINE=$(date -ud "2026-08-18 19:30" +%s)
HARD_DEADLINE=$(date -ud "2026-08-18 19:50" +%s)

stage() {
  # stage [-until HH:MM] name cmd...
  local cap=0
  if [ "$1" = "-until" ]; then cap=$(date -ud "2026-08-18 $2" +%s); shift 2; fi
  local name=$1; shift
  local now=$(date +%s)
  if [ -f /tmp/r3_queue12_stop ] || [ "$now" -ge "$SOFT_DEADLINE" ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop/deadline)" >> /tmp/r3_queue.log
    return 0
  fi
  local budget=$((HARD_DEADLINE - now))
  if [ "$cap" -gt 0 ] && [ $((cap - now)) -lt "$budget" ]; then
    budget=$((cap - now))
  fi
  if [ "$budget" -le 60 ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (no budget)" >> /tmp/r3_queue.log
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name (budget ${budget}s): $*" >> /tmp/r3_queue.log
  timeout -s TERM "$budget" "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> /tmp/r3_queue.log
}

probe_chip() {
  timeout 240 python3 -c "import jax; print(jax.devices())" \
    >> /tmp/r3_queue.log 2>&1
}

Q11PID=$(cat /tmp/r3_queue11.pid 2>/dev/null)
if [ -n "$Q11PID" ]; then
  while kill -0 "$Q11PID" 2>/dev/null; do sleep 30; done
fi
rm -f /tmp/r3_queue_stop
echo "=== $(date -u +%H:%M:%S) queue12 start (queue11 drained)" >> /tmp/r3_queue.log

# --- 1. large GDE h4, retried; trainer auto-resumes from ckpt ------
for attempt in 1 2 3; do
  stage -until 18:10 "D_gde_large_a${attempt}" python3 \
    experiments/medium_gde_ref_scale.py --env "$LARGE" \
    --epochs 20 --horizon 4 --tag h4 --checkpoint_every 2
  [ -f runs/gde_large_ref_h4/result.json ] && break
  probe_chip
done

# --- 2. large multistep tables --------------------------------------
stage D_gde_large_ms python3 experiments/gde_multistep.py \
  --env "$LARGE" --run_dir /root/repo/runs/gde_large_ref_h4

stage E_baselines_large_ms python3 experiments/baselines_multistep.py \
  --params_dir /root/repo/runs/baselines_large --env "$LARGE"

# --- 3. large QMIX under the coordination operator -------------------
stage QL_coord_eval python3 experiments/eval_rl_checkpoint.py \
  --resume_from runs/qmix_medium_5k_large/ckpt --env_id "$LARGE" \
  --algo qmix --net gnode --eval_episodes 8 --seeds 3 --coordinated \
  --out runs/coord_eval.jsonl

# --- 4. coordinated-training QMIX (queue11's question, capped) -------
stage -until 19:05 V_qmix_coordtrain python3 experiments/medium_qmix_5k.py \
  --env_id "$MEDIUM" --num_episodes 5000 --coordinated \
  --eval_every 500 --eval_episodes 8 --tag coordtrain

CK=runs/qmix_medium_5k_coordtrain/ckpt
if [ -d "$CK" ]; then
  stage W_export_blob python3 experiments/export_policy.py \
    --ckpt "$CK" --kind qmix --env_id "$MEDIUM" --net gnode \
    --hidden_dim 64 --coordinated --out runs/policy_qmix_coordtrain.stablehlo
fi

# --- 5. bench preflight (always last) --------------------------------
stage X_bench_preflight python3 bench.py

echo "=== $(date -u +%H:%M:%S) queue12 done" >> /tmp/r3_queue.log
