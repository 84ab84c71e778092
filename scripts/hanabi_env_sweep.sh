#!/bin/bash
# Fixed-experience Hanabi training sweep over env counts
# (reference: scripts/hanabi_env_train.sh — same shape: one fixed
# env-step budget trained at several batch sizes; the kernel cache is
# JAX's persistent compilation cache, set up by the scripts themselves).
#
# NOTE for the tunneled-TPU environment: the device grants to ONE process
# at a time — run the sweep sequentially as written, never in parallel.
set -e
cd "$(dirname "$0")"

for i in 256 1024 512; do
    python hanabi_train.py --num-envs "$i" --num-steps 64 \
        --total-timesteps 275000000 --lr 1e-3 --single "$@"
done
