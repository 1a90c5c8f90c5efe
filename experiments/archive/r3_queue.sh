#!/bin/bash
# Round-3 TPU job queue: waits for the GDE h4 run (pid in /tmp/gde_h4.pid)
# to finish, then serializes every remaining TPU job (one TPU process at a
# time on this VM). Each stage logs to /tmp/r3_<stage>.log; a crash in one
# stage does not stop the next. Kill the whole queue: kill $(cat /tmp/r3_queue.pid)
cd /root/repo
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
LARGE=tarware-large-15agvs-8pickers-partialobs-v1

stage() {  # stage <name> <cmd...>
  local name=$1; shift
  echo "=== $(date -u +%H:%M:%S) stage $name: $*" >> /tmp/r3_queue.log
  "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> /tmp/r3_queue.log
}

# Wait for the h4 training run to release the TPU.
if [ -f /tmp/gde_h4.pid ]; then
  while kill -0 "$(cat /tmp/gde_h4.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== $(date -u +%H:%M:%S) queue start" >> /tmp/r3_queue.log

# A: multi-step eval of the h4 flagship checkpoint (VERDICT item 2).
stage A_gde_h4_eval python3 experiments/gde_multistep.py \
  --run_dir /root/repo/runs/gde_medium_ref_h4

# B: QMIX 20k -> 30k resume with greedy eval probes (VERDICT item 3).
# The continuation anneals exploration further (floor 0.1 -> 0.05): at 28
# agents a 10% random-action rate keeps corridors perpetually disrupted,
# and the 15k-20k slope was flat (-0.19/1k) with TD loss pinned at 1e-4.
stage B_qmix_30k python3 experiments/medium_qmix_5k.py \
  --num_episodes 10000 \
  --resume_from /root/repo/runs/qmix_medium_5k_v2_20k/ckpt \
  --epsilon_min 0.05 \
  --eval_every 250 --eval_episodes 8 --tag v2_30k

# C: retrain the three multistep-table baselines with param saving, then
# score their multi-step rollouts on the same eval slice (VERDICT item 2).
stage C_baselines python3 experiments/medium_baselines_table.py \
  --models lstm pos_lstm pos_gru --save_params
stage C_baselines_ms python3 experiments/baselines_multistep.py \
  --params_dir /root/repo/runs/baselines_medium

# D: GDE at large scale, horizon-4 recipe (VERDICT item 4).
stage D_gde_large python3 experiments/medium_gde_ref_scale.py \
  --env "$LARGE" --epochs 60 --horizon 4 --tag h4
stage D_gde_large_ms python3 experiments/gde_multistep.py \
  --env "$LARGE" --run_dir /root/repo/runs/gde_large_ref_h4

# E: baselines at large scale + multi-step (VERDICT item 4).
stage E_baselines_large python3 experiments/medium_baselines_table.py \
  --env "$LARGE" --models gru lstm pos_gru pos_lstm --epochs 20 \
  --save_params --gde_result /root/repo/runs/gde_large_ref_h4/result.json
stage E_baselines_large_ms python3 experiments/baselines_multistep.py \
  --params_dir /root/repo/runs/baselines_large --env "$LARGE"

# F: QMIX 5k on large with greedy probes (VERDICT item 4).
stage F_qmix_large python3 experiments/medium_qmix_5k.py \
  --env_id "$LARGE" --num_episodes 5000 \
  --eval_every 250 --eval_episodes 8 --tag large_5k

# G: COMA with 32 lockstep envs + entropy anneal (VERDICT item 6).
stage G_coma32 python3 experiments/medium_coma_curve.py \
  --num_envs 32 --num_episodes 5000 --entropy_decay 0.9999 \
  --eval_every 250 --eval_episodes 8 --tag envs32

echo "=== $(date -u +%H:%M:%S) queue done" >> /tmp/r3_queue.log

# H: extralarge lever sweep + fresh medium profile + headline bench
# (VERDICT item 5 + perf bookkeeping).
stage H_xl_sweep python3 experiments/xl_sweep.py
stage H_profile python3 experiments/profile_step.py
stage H_profile_xl python3 experiments/profile_step.py \
  --env_id tarware-extralarge-19agvs-9pickers-partialobs-v1 --batch 512
stage H_bench python3 bench.py --verbose
echo "=== $(date -u +%H:%M:%S) queue done (incl H)" >> /tmp/r3_queue.log

# A2 (safety net, runs after H): full metric suite for the cut-early h4
# checkpoint — the driver only writes result.json on a complete run.
stage A2_gde_h4_metrics python3 experiments/gde_eval_ckpt.py
echo "=== $(date -u +%H:%M:%S) queue done (incl A2)" >> /tmp/r3_queue.log
