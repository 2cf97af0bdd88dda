#!/usr/bin/env bash
# Learning-loop seed campaign (VERDICT r3 #3): >=5 seeds on the jax arm
# plus the torch paired control on 3 seeds, all through the SHARED
# synthetic-world + eval protocol. One JSON line per run lands in
# $OUT (default /tmp/learning_campaign.jsonl).
set -u
OUT=${OUT:-/tmp/learning_campaign.jsonl}
: > "$OUT"
cd "$(dirname "$0")/.."
for seed in 0 1 2 3 4; do
    python tools/learning_loop.py --seed "$seed" --arm jax \
        --work-dir /tmp/ll_jax_$seed 2>/tmp/ll_jax_$seed.err \
        | tail -1 >> "$OUT"
    echo "jax seed $seed done: $(tail -1 "$OUT")"
done
for seed in 0 1 2; do
    python tools/learning_loop.py --seed "$seed" --arm torch \
        --work-dir /tmp/ll_torch_$seed 2>/tmp/ll_torch_$seed.err \
        | tail -1 >> "$OUT"
    echo "torch seed $seed done: $(tail -1 "$OUT")"
done
echo CAMPAIGN-DONE
