#!/bin/bash
# Round-4 sequential TPU job queue (one chip — jobs must not overlap).
set -x
cd /root/repo

# 1. BEV autoencoder pretrain (reference ships autoencoder.pt)
timeout 1800 python -m hope_tpu.train.pretrain_autoencoder \
    --steps 2000 --batch 64 --log-dir log/ae_r4 > runlogs/ae_r4.log 2>&1

# 2. SAC with the grafted frozen encoder — time-to-targets vs the r3b scratch
#    run (which first crossed all four targets ~20 min / ~340k episodes)
timeout 4000 python -m hope_tpu.train.train_sac --episodes 2000000 \
    --max-seconds 2700 --img-encoder log/ae_r4/ckpt --freeze-img-encoder \
    --log-dir log/sac_graft_r4 --save-every 100 --final-eval 256 \
    > runlogs/sac_graft_r4.log 2>&1

# 3. headline MPC DLP battery with candidate-window cycling + radius-8 staging
timeout 3600 python -m hope_tpu.planning.mpc --episodes 256 \
    --seed 0 --out log/mpc_r4c > runlogs/mpc_r4c.log 2>&1

# 4+5. MPC approach-phase ablations for the BASELINE table
timeout 3600 python -m hope_tpu.planning.mpc --episodes 256 --no-staging \
    --seed 0 --out log/mpc_r4_nostaging > runlogs/mpc_r4_nostaging.log 2>&1
timeout 3600 python -m hope_tpu.planning.mpc --episodes 256 --no-step-rs \
    --seed 0 --out log/mpc_r4_nosteprs > runlogs/mpc_r4_nosteprs.log 2>&1

# 5. PPO round-4 eval battery (best-gate checkpoint from the stabilized run)
timeout 2400 python -m hope_tpu.evaluation.eval_mix_scene log/ppo_r4/ckpt_best \
    --episodes 256 --out log/eval_ppo_r4 > runlogs/eval_ppo_r4.log 2>&1

# 6. headline bench (also warms the compile cache for the driver's capture)
timeout 2400 python bench.py > runlogs/bench_r4.json 2>runlogs/bench_r4.err

# 7. full-obs rollout roofline + trace (VERDICT r3 item 7)
timeout 2400 python benchmarks/profile_raster.py --trace runlogs/trace_imgrs \
    > runlogs/profile_raster.json 2>runlogs/profile_raster.err

echo QUEUE_DONE
