#!/bin/bash
# Sequential HLC training for the three remaining downstream tasks, producing
# shippable checkpoints (reference ships LLC + 4 task HLCs, ase/data/models).
# One TPU client at a time: runs strictly back-to-back.
set -u
cd "$(dirname "$0")/.."
EPOCHS=${EPOCHS:-600}
for task in Heading Location Reach; do
  lc=$(echo "$task" | tr 'A-Z' 'a-z')
  echo "=== HLC suite: Humanoid$task ($EPOCHS epochs) ==="
  python -u scripts/validate_ase.py --mode hrl --task "Humanoid$task" \
    --epochs "$EPOCHS" \
    --ckpt-out "output/validate_hrl_$lc/hlc.ckpt.npz" \
    > "/tmp/hlc_$lc.log" 2>&1
  echo "=== $task done (exit $?) ==="
done
