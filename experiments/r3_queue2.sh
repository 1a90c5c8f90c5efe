#!/bin/bash
# Round-3 TPU queue, part 2 — trimmed for the time left after the ~20:13
# axon-backend outage (chip lease stuck after a SIGKILLed client). Probes
# the backend until it answers, then runs the remaining stages.
cd /root/repo
LARGE=tarware-large-15agvs-8pickers-partialobs-v1

stage() {
  local name=$1; shift
  echo "=== $(date -u +%H:%M:%S) stage $name: $*" >> /tmp/r3_queue.log
  "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> /tmp/r3_queue.log
}

# Wait for the TPU to come back (probe every 5 min, give up after trying
# until round end — the driver's own bench needs the chip anyway).
until timeout 240 python3 -c "import jax; jax.devices()" 2>/dev/null; do
  echo "=== $(date -u +%H:%M:%S) TPU still unavailable" >> /tmp/r3_queue.log
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) TPU back; queue2 start" >> /tmp/r3_queue.log

# D: GDE at large scale, horizon-4 (trimmed to 40 epochs).
stage D_gde_large python3 experiments/medium_gde_ref_scale.py \
  --env "$LARGE" --epochs 40 --horizon 4 --tag h4
stage D_gde_large_ms python3 experiments/gde_multistep.py \
  --env "$LARGE" --run_dir /root/repo/runs/gde_large_ref_h4

# E: baselines at large scale (3 models, 15 epochs) + multi-step.
stage E_baselines_large python3 experiments/medium_baselines_table.py \
  --env "$LARGE" --models gru lstm pos_lstm --epochs 15 \
  --save_params --gde_result /root/repo/runs/gde_large_ref_h4/result.json
stage E_baselines_large_ms python3 experiments/baselines_multistep.py \
  --params_dir /root/repo/runs/baselines_large --env "$LARGE"

# F: QMIX on large with greedy probes (trimmed to 3k episodes).
stage F_qmix_large python3 experiments/medium_qmix_5k.py \
  --env_id "$LARGE" --num_episodes 3000 \
  --eval_every 250 --eval_episodes 8 --tag large_3k

# H: extralarge lever sweep + profiles + bench.
stage H_xl_sweep python3 experiments/xl_sweep.py
stage H_profile python3 experiments/profile_step.py
stage H_bench python3 bench.py --verbose

# G: COMA 32 envs (trimmed; lowest priority — runs only if time remains).
stage G_coma32 python3 experiments/medium_coma_curve.py \
  --num_envs 32 --num_episodes 2500 --entropy_decay 0.9999 \
  --eval_every 250 --eval_episodes 8 --tag envs32

echo "=== $(date -u +%H:%M:%S) queue2 done" >> /tmp/r3_queue.log
