#!/bin/bash
# Round-3 fresh-VM session queue, part 2 (gated on queue18): the
# beyond-reference size coverage. The reference never trained anything
# on extralarge (its baselines sweep stops at large,
# train_baselines.py:455-461); after this chain every one of the five
# registered sizes has trajectory-model evidence and the three biggest
# have an RL leg:
#  XA. extralarge datagen (5 seeds x 200).
#  XB. GDE h4 on extralarge — device_shard_episodes bounds the resident
#      uint8 obs tensor (extralarge obs_dim pushes the full 1000-episode
#      tensor past the 16 GB HBM), scan_chunk bounds dispatch duration
#      (axon tunnel kill, NOTES.md).
#  XC. extralarge multistep table + LSTM/pos baselines + QMIX leg.
#  XF. GDE h4 rows for the 4-size sweep (tiny/small/medium10).
#  X.  final bench preflight.
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
HARD_DEADLINE=$(date -ud "2026-08-19 13:30" +%s)
XL=tarware-extralarge-19agvs-9pickers-partialobs-v1
QLOG=/tmp/r3_queue.log

stage() {
  local name=$1; shift
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  if [ -f /tmp/r3_queue19_stop ] || [ "$budget" -le 60 ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop/deadline)" >> $QLOG
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name (budget ${budget}s): $*" >> $QLOG
  timeout -s TERM "$budget" "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> $QLOG
}

Q18PID=$(cat /tmp/r3_queue18.pid 2>/dev/null)
if [ -n "$Q18PID" ]; then
  while kill -0 "$Q18PID" 2>/dev/null; do sleep 30; done
fi
echo "=== $(date -u +%H:%M:%S) queue19 start (queue18 drained)" >> $QLOG

# --- XA. extralarge datagen -------------------------------------------
stage XA_datagen_xl python3 scripts/collect_data.py \
  --env_ids "$XL" --seeds 0 1000 2000 3000 4000 \
  --num_episodes 200 --batch 40 --out_dir datasets

# --- XB. GDE h4 extralarge (sharded residency + retries) ---------------
for a in 1 2 3; do
  stage XB_gde_xl_h4_a$a python3 experiments/medium_gde_ref_scale.py \
    --env "$XL" --epochs 40 --horizon 4 --tag h4 \
    --checkpoint_every 2 --scan_chunk 1000 --device_shard_episodes 250
  if grep -q "best val" "/tmp/r3_XB_gde_xl_h4_a$a.log" 2>/dev/null; then
    break
  fi
done

stage XB2_gde_xl_ms python3 experiments/gde_multistep.py \
  --env "$XL" --run_dir /root/repo/runs/gde_extralarge_ref_h4

# --- XC. extralarge baselines + RL leg ---------------------------------
stage XC_baselines_xl python3 experiments/medium_baselines_table.py \
  --env "$XL" --models lstm pos_gru pos_lstm --epochs 10 --save_params

stage XC2_baselines_xl_ms python3 experiments/baselines_multistep.py \
  --params_dir /root/repo/runs/baselines_extralarge --env "$XL"

stage XC3_qmix_xl python3 experiments/medium_qmix_5k.py \
  --env_id "$XL" --num_episodes 1500 \
  --eval_every 250 --eval_episodes 8 --tag xl

# --- XF. GDE h4 rows for the 4-size sweep ------------------------------
# explicit out dirs: the drivers key on the env's size token, which
# would alias medium-10-5 with the flagship medium-19-9 dirs
XF_gde() {  # $1 short name, $2 env id
  stage XF_gde_$1 python3 experiments/medium_gde_ref_scale.py \
    --env "$2" --epochs 30 --horizon 4 \
    --checkpoint_every 5 --scan_chunk 2000 \
    --out_dir "/root/repo/runs/gde_$1_ref_h4"
  stage XF_gde_$1_ms python3 experiments/gde_multistep.py \
    --env "$2" --run_dir "/root/repo/runs/gde_$1_ref_h4"
}
XF_gde tiny tarware-tiny-3agvs-2pickers-partialobs-v1
XF_gde small tarware-small-6agvs-3pickers-partialobs-v1
XF_gde medium10 tarware-medium-10agvs-5pickers-partialobs-v1

# --- X. final bench preflight ------------------------------------------
stage X_bench_final python3 bench.py

echo "=== $(date -u +%H:%M:%S) queue19 done" >> $QLOG
