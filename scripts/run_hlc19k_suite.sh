#!/bin/bash
# Re-run the four HLC trainings from the 19,333-epoch soak LLC on the real
# chip (one TPU client at a time; ~20-30 min each). Produces
# docs/validation_hrl_<task>_r5llc19k_history.json + output/hlc19k/<task>.ckpt.npz.
set -u
mkdir -p output/hlc19k
for t in Heading Location Reach Strike; do
  tl=$(echo $t | tr A-Z a-z)
  timeout 3000 python -u scripts/validate_ase.py --mode hrl --task Humanoid$t \
    --epochs 600 --llc output/soak_r5/Humanoid.ckpt.npz \
    --tag-suffix r5llc19k --no-doc \
    --ckpt-out output/hlc19k/$tl.ckpt.npz > /tmp/hlc19k_$tl.log 2>&1
  echo "=== $t exit=$? $(date -u +%H:%M:%S) ===" >> /tmp/hlc19k_all.log
done
