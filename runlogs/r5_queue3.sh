#!/bin/bash
set -x
cd /root/repo
timeout 1100 python -m hope_tpu.planning.mpc --episodes 256 --no-dlp \
    --level Complex --portfolio --seed 0 --out log/mpc_r5x_complex \
    > runlogs/mpc_r5x_complex.log 2>&1
timeout 1400 python -m hope_tpu.planning.mpc --episodes 256 \
    --portfolio --seed 0 --out log/mpc_r5x_dlp \
    > runlogs/mpc_r5x_dlp.log 2>&1
echo QUEUE3_DONE
