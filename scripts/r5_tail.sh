#!/bin/bash
# Round-5 manual tail (replaces r5_orchestrate.sh stages 4-6 to add the
# matched-step corpus-ablation eval): run AFTER the flagship trainer is
# stopped and the chip is free.
#   1. hybrid sample n=24 on best_train        (headline, fast sampler)
#   2. hybrid sample n=12 on snapshot_12000    (matched-step ablation vs r4)
#   3. PC sample n=24 on best_train            (reference-chain headline)
#   4. posts on the freed chip (hybrid24, snap12, pc24)
#   5. bench
# Usage: nohup scripts/r5_tail.sh > /tmp/r5_tail_nohup.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r5_tail.log
WD=training/quality_n256/r5
log() { echo "[tail5 $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

probe_tpu() {
    timeout 600 python - <<'EOF' >/dev/null 2>&1
import jax, numpy as np
x = jax.numpy.ones((128, 128))
assert float(np.asarray(x @ x)[0, 0]) == 128.0
EOF
}
gate() {
    for i in 1 2 3; do
        probe_tpu && return 0
        log "TPU probe failed (try $i); sleeping 240s"
        sleep 240
    done
    log "TPU unreachable; proceeding (timeouts bound the damage)"
}

gate
log "1: hybrid sample n=24 (best_train)"
timeout 2400 python scripts/quality_loop.py \
    --workdir "$WD" --num_designs 24 --batch 4 \
    --sampler hybrid --phase sample --samples_npz /tmp/n256_r5_hy.npz \
    --checkpoint best_train >> "$LOG" 2>&1
log "rc=$?"

# the snapshot ablation is redundant if the trainer was deadline-cut after
# its last best save: best_train then IS step 12000 (the samples.npz records
# step_trained; compare against the snapshot step)
best_step=$(python - <<'EOF'
import numpy as np
try:
    with np.load('/tmp/n256_r5_hy.npz') as z:
        print(int(z['step_trained']))
except Exception:
    print(-1)
EOF
)
if [ "$best_step" = "12000" ]; then
    log "2: SKIP snapshot eval (best_train is already step 12000)"
else
    gate
    log "2: hybrid sample n=12 (snapshot_12000, matched-step ablation; best=$best_step)"
    timeout 1800 python scripts/quality_loop.py \
        --workdir "$WD" --num_designs 12 --batch 4 \
        --sampler hybrid --phase sample --samples_npz /tmp/n256_r5_snap12.npz \
        --checkpoint "$WD/checkpoints/snapshot_12000" >> "$LOG" 2>&1
    log "rc=$?"
fi

gate
log "3: PC sample n=24 (best_train)"
timeout 4200 python scripts/quality_loop.py \
    --workdir "$WD" --num_designs 24 --batch 4 \
    --steps 1000 --phase sample --samples_npz /tmp/n256_r5_pc.npz \
    --checkpoint best_train >> "$LOG" 2>&1
log "rc=$?"

for job in "hy:hybrid:/tmp/n256_r5_hy.npz:reports/quality_n256_hybrid_r5.json:24" \
           "snap:hybrid:/tmp/n256_r5_snap12.npz:reports/quality_n256_snap12k_r5.json:12" \
           "pc:pc:/tmp/n256_r5_pc.npz:reports/quality_n256_r5.json:24"; do
    IFS=: read -r tag sampler npz out nd <<< "$job"
    [ -f "$npz" ] || { log "skip post $tag (no npz)"; continue; }
    gate
    log "4: post $tag (chip)"
    timeout 2400 python scripts/quality_loop.py \
        --workdir "$WD" --num_designs "$nd" --batch 4 \
        --sampler "$sampler" --steps 1000 --phase post --samples_npz "$npz" \
        --restarts 3 --max_iter 250 --platform axon \
        --out "$out" > "/tmp/n256_r5_post_$tag.log" 2>&1
    log "rc=$?"
done

gate
log "5: bench"
timeout 2700 python bench.py --repeats 2 >> "$LOG" 2>&1
log "rc=$?"
log "tail5 complete"
