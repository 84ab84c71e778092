#!/bin/bash
# One-claim TPU measurement sequence for after a tunnel device-grant outage.
# Order matters: hardware-compile validation of the kernels first (anything
# written against interpret mode may still fail Mosaic lowering), then the
# bench sweep, then the MAPPO layout sweep. Each stage is one python
# process (the tunnel grants the device to a single process; chains of
# short-lived processes are what wedge it).
set -x
cd "$(dirname "$0")/.."

timeout 5400 python -m pytest \
    tests/test_cartpole_pallas.py tests/test_balance_pallas.py \
    tests/test_acrobot_pallas.py tests/test_overcooked_pallas.py \
    tests/test_hanabi_megakernel.py tests/test_tpu_smoke.py -q \
    2>&1 | tail -3

timeout 5400 python scripts/bench_all.py 2>&1 | grep -E '^\{' \
    | tee /tmp/bench_all_results.jsonl

timeout 5400 python scripts/mappo_layout_sweep.py 2>&1 | tail -8
