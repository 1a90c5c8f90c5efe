#!/bin/bash
# Round-3 TPU queue, part 8 (fresh-VM session): regenerate the large
# datasets lost to the VM reset, then run the large-size evidence
# (VERDICT r2 item 4), the extralarge lever sweep (item 5) and the
# refreshed step profile. One TPU process at a time; waits for the
# medium datagen PID in /tmp/datagen.pid.
cd /root/repo
LARGE=tarware-large-15agvs-8pickers-partialobs-v1

stage() {
  local name=$1; shift
  if [ -f /tmp/r3_queue_stop ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop file)" >> /tmp/r3_queue.log
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name: $*" >> /tmp/r3_queue.log
  "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> /tmp/r3_queue.log
}

DGPID=$(cat /tmp/datagen.pid 2>/dev/null)
while [ -n "$DGPID" ] && kill -0 "$DGPID" 2>/dev/null; do
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) queue8 start" >> /tmp/r3_queue.log

stage A_datagen_large python3 scripts/collect_data.py \
  --env_ids "$LARGE" --seeds 0 1000 2000 3000 4000 \
  --num_episodes 200 --batch 40 --out_dir datasets

stage D_gde_large python3 experiments/medium_gde_ref_scale.py \
  --env "$LARGE" --epochs 20 --horizon 4 --tag h4

stage E_baselines_large python3 experiments/medium_baselines_table.py \
  --env "$LARGE" --models lstm pos_lstm --epochs 10 \
  --save_params --gde_result /root/repo/runs/gde_large_ref_h4/result.json

stage D_gde_large_ms python3 experiments/gde_multistep.py \
  --env "$LARGE" --run_dir /root/repo/runs/gde_large_ref_h4

stage E_baselines_large_ms python3 experiments/baselines_multistep.py \
  --params_dir /root/repo/runs/baselines_large --env "$LARGE"

stage F_qmix_large python3 experiments/medium_qmix_5k.py \
  --env_id "$LARGE" --num_episodes 1500 \
  --eval_every 250 --eval_episodes 8 --tag large

stage H_xl_sweep python3 experiments/xl_sweep.py

stage H_profile python3 experiments/profile_step.py

echo "=== $(date -u +%H:%M:%S) queue8 done" >> /tmp/r3_queue.log
