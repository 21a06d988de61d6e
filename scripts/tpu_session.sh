#!/bin/bash
# Round-2/3 TPU measurement session: gates -> exec experiment matrix -> bench.
# Run SOLO (no other TPU process; kill the probe loop first). Steps run
# sequentially; each logs to $LOG. Gate failures abort the experiment steps.
#
#   bash scripts/tpu_session.sh [stage]   # stage: gates|bench|capture|matrix|all
# "all" order: gates -> bench -> capture -> matrix, so a short TPU
# window still yields validated kernels + a bench datapoint.
set -u
cd /root/repo
# always keep the axon site dir, even when the caller exported PYTHONPATH
case ":${PYTHONPATH:-}:" in
  *:/root/.axon_site:*) export PYTHONPATH="/root/repo:${PYTHONPATH}" ;;
  *) export PYTHONPATH="/root/repo:${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site" ;;
esac
LOG=${LOG:-/tmp/tpu_session.log}
CAP=/tmp/exec_cap
stage=${1:-all}
say() { echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"; }
run() { # run <timeout_s> <label> cmd...
  local t=$1 label=$2; shift 2
  say "$label: $*"
  timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  say "$label rc=$rc"
  return $rc
}

if [[ $stage == gates || $stage == all ]]; then
  run 1800 gate-exec python scripts/validate_pallas_exec.py || exit 1
  run 1800 gate-seq  python scripts/validate_pallas_seq.py  || exit 1
  run 2400 gate-corpus python scripts/corpus_device.py --tpu || exit 1
fi

if [[ $stage == bench || $stage == all ]]; then
  run 3600 bench python bench.py 128 none
  # seq-bucket width past the 2048 cap (kbench trend unsaturated; VMEM
  # math allows 4096 at typical stream widths)
  run 3600 bench-seq4096 env ZSTD_TPU_SEQ_BMAX=4096 python bench.py 128 none
fi

if [[ $stage == capture || $stage == all ]]; then
  mkdir -p $CAP; rm -f $CAP/*.npz
  run 2400 capture env ZSTD_TPU_CAPTURE_EXEC=$CAP python scripts/kbench_exec.py capture 32 || exit 1
fi

if [[ $stage == matrix || $stage == all ]]; then
  run 1200 replay-base python scripts/kbench_exec.py $CAP
  # cost attribution (replay only; numbers, not correctness)
  for ab in body slow fused roll load; do
    run 1200 "ablate-$ab" env ZSTD_TPU_EXEC_ABLATE=$ab python scripts/kbench_exec.py $CAP
  done
  # candidate variants: validate first, then replay-time
  if run 1800 val-masked env ZSTD_TPU_EXEC_MASKED_STORE=1 python scripts/validate_pallas_exec.py; then
    run 1200 replay-masked env ZSTD_TPU_EXEC_MASKED_STORE=1 python scripts/kbench_exec.py $CAP
  fi
  if run 1800 val-pre env ZSTD_TPU_EXEC_PRE=1 python scripts/validate_pallas_exec.py; then
    run 1200 replay-pre env ZSTD_TPU_EXEC_PRE=1 python scripts/kbench_exec.py $CAP
  fi
  if run 1800 val-split env ZSTD_TPU_EXEC_SPLIT=1 python scripts/validate_pallas_exec.py; then
    run 1200 replay-split env ZSTD_TPU_EXEC_SPLIT=1 python scripts/kbench_exec.py $CAP
  fi
  if run 1800 val-both env ZSTD_TPU_EXEC_MASKED_STORE=1 ZSTD_TPU_EXEC_PRE=1 python scripts/validate_pallas_exec.py; then
    run 1200 replay-both env ZSTD_TPU_EXEC_MASKED_STORE=1 ZSTD_TPU_EXEC_PRE=1 python scripts/kbench_exec.py $CAP
  fi
  if run 1800 val-ms env ZSTD_TPU_EXEC_MASKED_STORE=1 ZSTD_TPU_EXEC_SPLIT=1 python scripts/validate_pallas_exec.py; then
    run 1200 replay-ms env ZSTD_TPU_EXEC_MASKED_STORE=1 ZSTD_TPU_EXEC_SPLIT=1 python scripts/kbench_exec.py $CAP
  fi
  # L=8 was neutral before the slow-dispatch hoist; remeasure
  run 1200 replay-L8 env ZSTD_TPU_EXEC_L=8 python scripts/kbench_exec.py $CAP
fi

say done
