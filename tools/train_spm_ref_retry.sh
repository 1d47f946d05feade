#!/bin/bash
# Unattended driver for the SPM reference-scale evidence run: relaunch
# with --resume auto after tunnel stalls / worker crashes (DESIGN.md SPM
# postmortem documents both failure modes: a worker crash surfaces as a
# JaxRuntimeError exit, a tunnel RPC stall hangs forever mid-save).
# A watchdog kills the attempt when the log stops growing for STALE_S
# seconds (healthy epochs print every ~76 s); each attempt resumes from
# the newest finalized checkpoint.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/spm_ref_retry.log}
STALE_S=${STALE_S:-480}
MAX_S=${MAX_S:-18000}
for attempt in 1 2 3 4 5 6 7 8; do
  echo "=== attempt $attempt $(date -u +%H:%M:%S) ===" >> "$LOG"
  python -u train_spm.py --cfg configs/spm_synth_ref.yaml \
    --resume auto >> "$LOG" 2>&1 &
  PID=$!
  start=$(date +%s)
  rc=""
  while true; do
    sleep 20
    if ! kill -0 "$PID" 2>/dev/null; then
      wait "$PID"; rc=$?
      break
    fi
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG")
    if [ $((now - mt)) -gt "$STALE_S" ]; then
      echo "=== watchdog: no output for ${STALE_S}s, killing $PID ===" \
        >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      rc=99
      break
    fi
    if [ $((now - start)) -gt "$MAX_S" ]; then
      echo "=== watchdog: attempt exceeded ${MAX_S}s, killing $PID ===" \
        >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      rc=98
      break
    fi
  done
  echo "=== attempt $attempt exit $rc $(date -u +%H:%M:%S) ===" >> "$LOG"
  [ "$rc" = "0" ] && break
  # drop half-written checkpoint dirs so auto-resume picks a clean one
  find saved/single-stage-pose-machines_spm-synth-ref -maxdepth 3 \
    -name "*.orbax-checkpoint-tmp" -exec rm -rf {} + 2>/dev/null
  # wait for the worker to come back (crash recovery is ~4 min)
  for probe in 1 2 3 4 5 6 7 8 9 10; do
    if timeout 90 python -c "import jax, jax.numpy as jnp; \
x=jnp.ones((64,64)); print(float((x@x).sum()))" > /dev/null 2>&1; then
      break
    fi
    sleep 30
  done
done
echo "=== retry driver done $(date -u +%H:%M:%S) ===" >> "$LOG"
