#!/bin/bash
# Round-5 single-chip device schedule (nohup this; sessions die, jobs survive).
# Priority order = r4 verdict order: flagship convergence evidence first,
# text steering second, everything else best-effort.
#   0. wait for the on-chip corpus generation to finish
#   1. text cfgft continuation 9.5k -> 26k steps (supervised, ~30 min)
#   2. text steering contrast evals on that checkpoint (unguided + cfg 2.0)
#   3. flagship N=256 r5 on the 3x corpus until T_CUT_EPOCH (supervised;
#      trainer writes the matched-step snapshot_12000 itself)
#   4. N=256 quality n=24: hybrid + PC sample phases, then post phases ON
#      the freed chip (--platform axon: ~8x the 1-core-CPU realize rate)
#   5. CFG quality-cost sweep + bench, gated on time left
#
# Usage: T_CUT_EPOCH=<epoch-s> nohup scripts/r5_orchestrate.sh > /tmp/r5_orch.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r5_orchestrate.log
T_CUT_EPOCH="${T_CUT_EPOCH:?set T_CUT_EPOCH (epoch seconds to stop flagship training)}"
FLAG_WORKDIR=training/quality_n256/r5
TLOG=/tmp/train_n256_r5.log

log() { echo "[r5 $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

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
    log "TPU still unreachable; proceeding (step timeouts bound the damage)"
}

left_s() { echo $(( T_CUT_EPOCH + 6300 - $(date +%s) )); }  # round ends ~105 min after cut

# ---- 0. corpus ----------------------------------------------------------
while kill -0 "$(cat /tmp/corpus_gen.pid 2>/dev/null || echo 0)" 2>/dev/null; do
    sleep 20
done
log "corpus ready: $(ls data/processed_synth_n256 | wc -l) records"

# ---- 1. text continuation ----------------------------------------------
gate
log "stage 1: text cfgft -> 26k steps"
DEADLINE_S=4200 STALL_S=900 scripts/train_supervised.sh \
    configs/quality_text_cfgft.yml training/quality_text_cfgft/r4 26000 \
    /tmp/train_text_r5.log
log "stage 1 rc=$? (last: $(tail -n 1 /tmp/train_text_r5.log 2>/dev/null))"

# ---- 2. text steering evidence -----------------------------------------
gate
log "stage 2: text contrast (unguided)"
timeout 1800 python scripts/eval_text_contrast.py \
    --workdir training/quality_text_cfgft/r4 --checkpoint best_train \
    --batch 16 --steps 1000 \
    --out reports/quality_text_r5.json >> "$LOG" 2>&1
log "contrast rc=$?"
gate
log "stage 2b: text contrast (cfg 2.0)"
timeout 1800 python scripts/eval_text_contrast.py \
    --workdir training/quality_text_cfgft/r4 --checkpoint best_train \
    --batch 16 --steps 1000 --cfg_scale 2.0 \
    --out reports/quality_text_cfg_r5.json >> "$LOG" 2>&1
log "contrast cfg rc=$?"

# ---- 3. flagship window -------------------------------------------------
gate
log "stage 3: flagship N=256 r5 (cut at $(date -u -d @"$T_CUT_EPOCH" +%H:%M:%S))"
now=$(date +%s)
DEADLINE_S=$(( T_CUT_EPOCH - now )) scripts/train_supervised.sh \
    configs/quality_n256_r5.yml "$FLAG_WORKDIR" 26000 "$TLOG" &
SUP=$!
echo $SUP > /tmp/supervise.pid
while kill -0 $SUP 2>/dev/null; do
    [ "$(date +%s)" -ge "$T_CUT_EPOCH" ] && break
    sleep 60
done
if kill -0 $SUP 2>/dev/null; then
    for i in $(seq 1 40); do
        case "$(tail -n 1 "$TLOG" 2>/dev/null)" in
            *"saving meta checkpoint"*|*"saving best checkpoint"*|*"state transfer"*)
                log "save in flight; waiting"; sleep 30 ;;
            *) break ;;
        esac
    done
    log "cutting flagship training"
    kill $SUP 2>/dev/null
    kill "$(cat "$TLOG.trainer.pid" 2>/dev/null || echo 99999999)" 2>/dev/null
    sleep 10
    kill -9 "$(cat "$TLOG.trainer.pid" 2>/dev/null || echo 99999999)" 2>/dev/null
    sleep 5
fi
log "flagship window closed; last lines:"
grep -v "WARNING" "$TLOG" 2>/dev/null | tail -3 >> "$LOG"

# ---- 4. N=256 quality n=24 ---------------------------------------------
gate
log "stage 4: hybrid sample n=24"
timeout 2400 python scripts/quality_loop.py \
    --workdir "$FLAG_WORKDIR" --num_designs 24 --batch 4 \
    --sampler hybrid --phase sample --samples_npz /tmp/n256_r5_hy.npz \
    --checkpoint best_train >> "$LOG" 2>&1
log "hybrid sample rc=$?"
gate
log "stage 4b: PC sample n=24"
timeout 4200 python scripts/quality_loop.py \
    --workdir "$FLAG_WORKDIR" --num_designs 24 --batch 4 \
    --steps 1000 --phase sample --samples_npz /tmp/n256_r5_pc.npz \
    --checkpoint best_train >> "$LOG" 2>&1
log "pc sample rc=$?"
if [ -f /tmp/n256_r5_hy.npz ]; then
    gate
    log "stage 4c: hybrid post (chip)"
    timeout 2400 python scripts/quality_loop.py \
        --workdir "$FLAG_WORKDIR" --num_designs 24 --batch 4 \
        --sampler hybrid --phase post --samples_npz /tmp/n256_r5_hy.npz \
        --restarts 3 --max_iter 250 --platform axon \
        --out reports/quality_n256_hybrid_r5.json > /tmp/n256_r5_hy_post.log 2>&1
    log "hybrid post rc=$?"
fi
if [ -f /tmp/n256_r5_pc.npz ]; then
    gate
    log "stage 4d: PC post (chip)"
    timeout 2400 python scripts/quality_loop.py \
        --workdir "$FLAG_WORKDIR" --num_designs 24 --batch 4 \
        --steps 1000 --phase post --samples_npz /tmp/n256_r5_pc.npz \
        --restarts 3 --max_iter 250 --platform axon \
        --out reports/quality_n256_r5.json > /tmp/n256_r5_pc_post.log 2>&1
    log "pc post rc=$?"
fi

# ---- 5. best-effort extras ---------------------------------------------
if [ "$(left_s)" -gt 2400 ]; then
    gate
    log "stage 5: cfg sweep"
    timeout 3600 python scripts/eval_cfg_sweep.py \
        --workdir training/quality_text_cfgft/r4 --scales 1,2,3 \
        --checkpoint best_train --batch 16 --steps 1000 \
        --restarts 2 --max_iter 200 \
        --out reports/quality_text_cfg_sweep_r5.json >> "$LOG" 2>&1
    log "cfg sweep rc=$?"
fi
gate
log "stage 6: bench"
timeout 2700 python bench.py --repeats 2 >> "$LOG" 2>&1
log "bench rc=$?"
log "r5 device schedule complete"
