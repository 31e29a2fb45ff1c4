#!/bin/bash
# Round-5 (resumed session) sequential TPU job queue (one chip — no overlap).
set -x
cd /root/repo

# 1. PPO plateau run (VERDICT r4 item 3): resume the committed r3 best ckpt
#    under the stabilized regime with the trust region relaxed to 0.06
#    (0.03 tripped on 100% of buffer passes in the r4 run — the region,
#    not the data, was binding).  Constant lr: the r4 linear decay to ~0
#    froze late learning (Extrem fell to 0.617).
timeout 4150 python -m hope_tpu.train.train_ppo --episodes 2000000 \
    --max-seconds 3900 --gradient-clip --target-kl 0.06 \
    --resume results/ckpt_ppo_r3 --log-dir log/ppo_r5 --save-every 50 \
    > runlogs/ppo_r5.log 2>&1

# 2. PPO round-5 eval battery on the best-gate checkpoint
timeout 1500 python -m hope_tpu.evaluation.eval_mix_scene log/ppo_r5/ckpt_best \
    --episodes 256 --out log/eval_ppo_r5 > runlogs/eval_ppo_r5.log 2>&1

echo QUEUE_DONE
