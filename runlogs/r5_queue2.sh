#!/bin/bash
# Follow-on TPU queue: waits for the PPO queue (r5_queue.sh) to finish, then
# re-runs the Extrem + Normal pure-MPC batteries under the widened wiggle
# library (coverage 0.852 -> 0.9375 on the same bank, commit 44dfa68).
set -x
cd /root/repo
while ! grep -q QUEUE_DONE runlogs/r5_queue.log 2>/dev/null; do sleep 20; done
timeout 1200 python -m hope_tpu.planning.mpc --episodes 256 --no-dlp \
    --level Extrem --portfolio --seed 0 --out log/mpc_r5x_extrem \
    > runlogs/mpc_r5x_extrem.log 2>&1
timeout 1200 python -m hope_tpu.planning.mpc --episodes 256 --no-dlp \
    --level Normal --portfolio --seed 0 --out log/mpc_r5x_normal \
    > runlogs/mpc_r5x_normal.log 2>&1
echo QUEUE2_DONE
