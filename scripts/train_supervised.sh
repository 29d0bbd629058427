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
# Two distinct tunnel-death modes are handled:
#   1. the trainer CRASHES (remote_compile connection refused) -> probe loop;
#   2. the trainer HANGS forever on a dead RPC (observed: 64 min of silence
#      mid-step, 0 CPU, while the tunnel recovered underneath it). A watchdog
#      kills the trainer when the log goes stale for STALL_S seconds — longer
#      grace (SAVE_STALL_S) while the last log line says a meta checkpoint
#      save is in flight, since N=256 meta saves legitimately block O(20 min)
#      over the 3 MB/s tunnel with no output.
#
# Usage: scripts/train_supervised.sh <config> <workdir> <max_steps> [logfile]
set -u
CONFIG="$1"
WORKDIR="$2"
MAX_STEPS="$3"
LOG="${4:-/tmp/train_supervised.log}"
DEADLINE_S="${DEADLINE_S:-19800}"     # give up after ~5.5h wall
STALL_S="${STALL_S:-1200}"            # kill a silent trainer after 20 min
SAVE_STALL_S="${SAVE_STALL_S:-2700}"  # ... 45 min if a meta save is in flight
TRANSFER_STALL_S="${TRANSFER_STALL_S:-600}"  # ... only 10 min mid-transfer:
# the chunked device->host copy (cli/train.py fetch_state_chunked) prints
# progress every ~20 s while healthy, so silence means a dead RPC — kill
# fast instead of absorbing the old 33-min monolithic-device_get hang
WATCH_INTERVAL="${WATCH_INTERVAL:-60}"
START=$(date +%s)

probe_tpu() {
    # 600s: the FIRST program on a cold/degraded tunnel has taken 253s, and
    # per-process tunnel session setup alone has run 7+ min on a degraded
    # day (CLAUDE.md) — a 300s probe false-negatives and starves the retry
    # loop while the device is actually fine.
    timeout "${PROBE_TIMEOUT_S:-600}" python - <<'EOF' >/dev/null 2>&1
import jax, numpy as np
x = jax.numpy.ones((128, 128))
assert float(np.asarray(x @ x)[0, 0]) == 128.0
EOF
}

log_stale_s() {
    local m
    m=$(stat -c %Y "$LOG" 2>/dev/null) || m=$START
    echo $(( $(date +%s) - m ))
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
    timeout "$left" python -u -m text2protein_tpu.cli.train "$CONFIG" \
        --resume "$WORKDIR" --max_steps "$MAX_STEPS" >> "$LOG" 2>&1 &
    trainer=$!
    echo "$trainer" > "$LOG.trainer.pid"

    # ---- watchdog: wait for exit, or kill on log staleness
    rc=""
    while kill -0 "$trainer" 2>/dev/null; do
        sleep "$WATCH_INTERVAL"
        stale=$(log_stale_s)
        limit=$STALL_S
        if tail -n 1 "$LOG" 2>/dev/null | grep -q "state transfer"; then
            # chunked transfer in flight: healthy ones log every ~20 s
            limit=$TRANSFER_STALL_S
        elif tail -n 1 "$LOG" 2>/dev/null | grep -q "saving meta checkpoint\|saving best checkpoint\|evaluating at step"; then
            # saves AND first-boundary eval compiles legitimately block
            # silently for many minutes at N=256 (observed 17 min for the
            # eval-program compile)
            limit=$SAVE_STALL_S
        fi
        if [ "$stale" -ge "$limit" ]; then
            echo "[supervise] log stale ${stale}s (limit ${limit}s); killing hung trainer $trainer" >> "$LOG"
            kill "$trainer" 2>/dev/null
            sleep 10
            kill -9 "$trainer" 2>/dev/null
            rc=98
            break
        fi
        now=$(date +%s)
        if [ $((DEADLINE_S - (now - START))) -le 60 ]; then
            echo "[supervise] deadline during run; stopping trainer $trainer" >> "$LOG"
            kill "$trainer" 2>/dev/null
            wait "$trainer" 2>/dev/null
            exit 3
        fi
    done
    if [ -z "$rc" ]; then
        wait "$trainer"; rc=$?
    else
        wait "$trainer" 2>/dev/null
    fi

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
