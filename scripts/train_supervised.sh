#!/bin/bash
# Supervised training launcher for long runs over the flaky axon tunnel.
#
# The tunnel can die mid-run (remote_compile "Connection refused" — see
# CLAUDE.md); the trainer checkpoints (meta every snapshot_freq_for_preemption
# steps, best_* on eval improvement) and `--resume <workdir>` restores the
# freshest state. This wrapper loops: run the trainer against a FIXED workdir,
# and on non-zero exit gate the relaunch on a TPU liveness probe (small matmul
# with a timeout, retried every ~5 min) so we don't burn retries against a
# dead tunnel.
#
# Usage: scripts/train_supervised.sh <config> <workdir> <max_steps> [logfile]
set -u
CONFIG="$1"
WORKDIR="$2"
MAX_STEPS="$3"
LOG="${4:-/tmp/train_supervised.log}"
DEADLINE_S="${DEADLINE_S:-19800}"   # give up after ~5.5h wall
START=$(date +%s)

probe_tpu() {
    timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax, numpy as np
x = jax.numpy.ones((128, 128))
assert float(np.asarray(x @ x)[0, 0]) == 128.0
EOF
}

attempt=0
while true; do
    now=$(date +%s)
    left=$((DEADLINE_S - (now - START)))
    if [ "$left" -le 300 ]; then
        echo "[supervise] deadline reached; stopping" >> "$LOG"
        exit 3
    fi
    attempt=$((attempt + 1))
    echo "[supervise] attempt $attempt ($(date -u +%H:%M:%S), ${left}s left)" >> "$LOG"
    timeout "$left" python -m text2protein_tpu.cli.train "$CONFIG" \
        --resume "$WORKDIR" --max_steps "$MAX_STEPS" >> "$LOG" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then
        echo "[supervise] trainer finished cleanly" >> "$LOG"
        exit 0
    fi
    echo "[supervise] trainer exited rc=$rc; probing TPU before retry" >> "$LOG"
    until probe_tpu; do
        now=$(date +%s)
        if [ $((DEADLINE_S - (now - START))) -le 600 ]; then
            echo "[supervise] TPU still dead at deadline; giving up" >> "$LOG"
            exit 4
        fi
        echo "[supervise] TPU probe failed; sleeping 300s" >> "$LOG"
        sleep 300
    done
    echo "[supervise] TPU alive; resuming" >> "$LOG"
done
