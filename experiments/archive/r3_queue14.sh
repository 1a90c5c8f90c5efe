#!/bin/bash
# Round-3 TPU queue, part 14 (fresh session, post-queue13 harvest):
#  1. S_qmix_large_stoch     — sampled-operator eval of the large QMIX ckpt
#                              (its greedy+auction read 0.0; the COMA lesson
#                              says sweep the serving operator before calling
#                              a policy dead).
#  2. C2_coordtrain_15k      — resume the coordinated-training QMIX 5k -> 15k
#                              (greedy probes were still climbing at cutoff:
#                              76.5 -> 89.1 -> 83.2; target >= 100).
#  3. D_gde_large_h4         — large GDE h4 retry WITH the chunked epoch scan
#                              (scan_chunk=1500 bounds each dispatch ~10 s;
#                              the 3/3 queue12 crashes are diagnosed as the
#                              axon tunnel killing ~80-90 s dispatches).
#                              3 attempts, checkpoint_every=2 + auto-resume.
#  4. D2_gde_large_ms        — multistep table for the trained large GDE.
#  5. E2_baselines_large_pos — gru/pos_gru/pos_lstm on large (the old
#                              in-process loop OOMed on model #2; the driver
#                              now runs one subprocess per model).
#  6. E3_baselines_large_ms  — large baselines multistep with the pos models.
#  7. X_bench                — bench preflight last (B=2048 default).
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
HARD_DEADLINE=$(date -ud "2026-08-19 07:45" +%s)

stage() {
  local name=$1; shift
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  if [ -f /tmp/r3_queue14_stop ] || [ "$budget" -le 60 ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop/deadline)" >> /tmp/r3_queue.log
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name (budget ${budget}s): $*" >> /tmp/r3_queue.log
  timeout -s TERM "$budget" "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> /tmp/r3_queue.log
}

echo "=== $(date -u +%H:%M:%S) queue14 start" >> /tmp/r3_queue.log

stage S_qmix_large_stoch python3 experiments/eval_rl_checkpoint.py \
  --resume_from runs/qmix_medium_5k_large/ckpt \
  --env_id tarware-large-15agvs-8pickers-partialobs-v1 \
  --algo qmix --net gnode --eval_episodes 8 --seeds 3 \
  --stochastic --out runs/coord_eval.jsonl

stage S2_qmix_large_stoch_coord python3 experiments/eval_rl_checkpoint.py \
  --resume_from runs/qmix_medium_5k_large/ckpt \
  --env_id tarware-large-15agvs-8pickers-partialobs-v1 \
  --algo qmix --net gnode --eval_episodes 8 --seeds 3 \
  --stochastic --coordinated --out runs/coord_eval.jsonl

stage C2_coordtrain_15k python3 experiments/medium_qmix_5k.py \
  --env_id tarware-medium-19agvs-9pickers-partialobs-v1 \
  --num_episodes 15000 --coordinated --eval_every 500 --eval_episodes 8 \
  --tag coordtrain --resume_from runs/qmix_medium_5k_coordtrain/ckpt

for a in 1 2 3; do
  stage D_gde_large_h4_b$a python3 experiments/medium_gde_ref_scale.py \
    --env tarware-large-15agvs-8pickers-partialobs-v1 \
    --epochs 60 --horizon 4 --tag h4 --checkpoint_every 2 --scan_chunk 1500
  if grep -q "best val" "/tmp/r3_D_gde_large_h4_b$a.log" 2>/dev/null; then
    break
  fi
done

stage D2_gde_large_ms python3 experiments/gde_multistep.py \
  --env tarware-large-15agvs-8pickers-partialobs-v1 \
  --run_dir /root/repo/runs/gde_large_ref_h4

stage E2_baselines_large_pos python3 experiments/medium_baselines_table.py \
  --env tarware-large-15agvs-8pickers-partialobs-v1 \
  --models gru pos_gru pos_lstm --epochs 10 --save_params \
  --gde_result /root/repo/runs/gde_large_ref_h4/result.json

stage E3_baselines_large_ms python3 experiments/baselines_multistep.py \
  --params_dir /root/repo/runs/baselines_large \
  --env tarware-large-15agvs-8pickers-partialobs-v1

stage X_bench python3 bench.py

echo "=== $(date -u +%H:%M:%S) queue14 done" >> /tmp/r3_queue.log
