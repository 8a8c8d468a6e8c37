#!/bin/bash
# Chip-recovery runbook (CLAUDE.md): wait for the TPU relay to come back,
# then run the full on-hardware verification + measurement pipeline,
# SERIALIZED (one TPU job at a time — concurrent compiles wedge the relay)
# and with no per-step timeout (never kill mid-compile).
#
# Usage:  nohup bash scripts/runbook.sh [watch_pid] > /tmp/tpu_logs/runbook.log 2>&1 &
#
# If a watch loop (/tmp/tpu_watch.sh) is running, pass its PID: the runbook
# waits for it to exit and requires "TPU RECOVERED" in its log before
# touching the chip (two probers would be two concurrent TPU jobs).  With
# no watch loop, the runbook probes on its own every 5 min.
#
# Steps (each gated on the previous artifact, all logged under
# /tmp/tpu_logs/, artifacts under results_tpu/):
#   1. experiments/tpu_verify.py      — round-1 kernels still green
#   2. experiments/tpu_verify_r2.py   — session kernels (tile DMA, GINE,
#      readout, int8 epilogues); all_pass => GNNB_STAGED_OK=1 downstream
#   3. experiments/window_mode_ab.py  — sub vs tile DMA schedule; winner
#      => GNNB_WINDOW_MODE downstream
#   4. experiments/spmm_roofline.py   — BASELINE SpMM target artifact
#   5. bench.py                       — headline refresh (staged kernels
#      enabled iff verified)
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
LOGDIR=/tmp/tpu_logs
mkdir -p "$LOGDIR" results_tpu
WATCH_PID="${1:-}"
WATCH_LOG=/tmp/tpu_logs/watch.log
STATUS="$LOGDIR/runbook_status.txt"
: > "$STATUS"

note() { echo "[runbook $(date +%H:%M:%S)] $*" | tee -a "$STATUS"; }

# ---- phase 0: wait for chip recovery --------------------------------------
if [ -n "$WATCH_PID" ] && kill -0 "$WATCH_PID" 2>/dev/null; then
  note "waiting for watch loop (pid $WATCH_PID) to exit"
  while kill -0 "$WATCH_PID" 2>/dev/null; do sleep 60; done
  if ! grep -q "TPU RECOVERED" "$WATCH_LOG" 2>/dev/null; then
    note "watch loop exhausted without recovery — giving up"
    exit 1
  fi
  note "watch loop reports recovery"
else
  if [ -n "$WATCH_PID" ]; then
    note "watch pid $WATCH_PID already gone"
    if ! grep -q "TPU RECOVERED" "$WATCH_LOG" 2>/dev/null; then
      note "no recovery recorded; probing directly"
    fi
  fi
  if ! grep -q "TPU RECOVERED" "$WATCH_LOG" 2>/dev/null; then
    for i in $(seq 1 120); do
      note "probe attempt $i"
      python - <<'EOF' >> "$LOGDIR/runbook_probe.log" 2>&1 && break
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.float32)
print("result:", float(jax.jit(lambda a: (a @ a).sum())(x)), flush=True)
EOF
      [ "$i" -eq 120 ] && { note "no recovery after 120 probes"; exit 1; }
      sleep 300
    done
    note "probe succeeded — chip is back"
  fi
fi

# confirm with one tiny fresh jit before the heavy steps (a half-recovered
# relay fails here cheaply instead of 20 min into a verify run)
note "confirmation probe"
if ! python - <<'EOF' >> "$LOGDIR/runbook_probe.log" 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
print("confirm:", float(jax.jit(lambda a: (a @ a).astype(jnp.float32).sum())(x)), flush=True)
EOF
then
  note "confirmation probe FAILED — aborting (see runbook_probe.log)"
  exit 1
fi
note "confirmed; starting pipeline"

run_step() {  # run_step <name> <cmd...>
  local name=$1; shift
  note "step $name: START"
  "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  note "step $name: rc=$rc"
  return $rc
}

# ---- 1. round-1 kernel verification ---------------------------------------
run_step verify_r1 python experiments/tpu_verify.py || true

# ---- 2. session kernels; enable staged kernels downstream iff all_pass ----
run_step verify_r2 python experiments/tpu_verify_r2.py || true
if python - <<'EOF'
import json, sys
try:
    r = json.load(open("results_tpu/fused_parity_tpu_r2.json"))
except Exception:
    sys.exit(1)
sys.exit(0 if r.get("all_pass") else 1)
EOF
then
  export GNNB_STAGED_OK=1
  note "verify_r2 all_pass=true -> GNNB_STAGED_OK=1 for remaining steps"
else
  note "verify_r2 not all_pass -> staged kernels stay gated"
fi

# ---- 3. window-mode A/B; apply the winner downstream ----------------------
run_step window_ab python experiments/window_mode_ab.py || true
BEST=$(python - <<'EOF'
import json
try:
    r = json.load(open("results_tpu/window_mode_ab.json"))
    b = r.get("best")
    print(b if b in ("sub", "tile") else "")
except Exception:
    print("")
EOF
)
if [ -n "$BEST" ]; then
  export GNNB_WINDOW_MODE="$BEST"
  note "window A/B winner: $BEST -> GNNB_WINDOW_MODE=$BEST"
fi

# ---- 4. SpMM roofline artifact --------------------------------------------
run_step spmm_roofline python experiments/spmm_roofline.py || true

# ---- 5. headline bench refresh --------------------------------------------
note "step bench: START (GNNB_STAGED_OK=${GNNB_STAGED_OK:-0} GNNB_WINDOW_MODE=${GNNB_WINDOW_MODE:-})"
python bench.py > "$LOGDIR/bench_stdout.json" 2> "$LOGDIR/bench.log"
rc=$?
note "step bench: rc=$rc"
[ $rc -eq 0 ] && cp "$LOGDIR/bench_stdout.json" results_tpu/bench_r2_refresh.json

note "RUNBOOK COMPLETE"
