#!/bin/bash
# Round-4 measurement session 1: entropy-kernel hazard attribution +
# lockstep-corruption bisection. One TPU process at a time (tunnel).
set -x
cd /root/repo

echo "=== kbench baseline (huff+seq, B=2048) ==="
timeout 900 python scripts/kbench.py both 2048

for ab in cachehaz store fetch lookup; do
  echo "=== seq ablate $ab ==="
  ZSTD_TPU_SEQ_ABLATE=$ab timeout 900 python scripts/kbench.py seq 2048
done
for ab in cachehaz store fetch lookup; do
  echo "=== huff ablate $ab ==="
  ZSTD_TPU_HUFF_ABLATE=$ab timeout 900 python scripts/kbench.py huff 2048
done

echo "=== lockstep probes ==="
# exact-at-cap sanity (16.8 MB total, inside clamp)
timeout 900 python scripts/probe_lockstep.py 1024 1024 2
# corrupt repro (25.2 MB total) — requires clamp bypass
ZSTD_TPU_WEXEC_NOCLAMP=1 timeout 900 python scripts/probe_lockstep.py 1024 2048 2
# NOALIAS hypothesis at the corrupting size
ZSTD_TPU_WEXEC_NOCLAMP=1 ZSTD_TPU_WEXEC_NOALIAS=1 timeout 900 python scripts/probe_lockstep.py 1024 2048 2
# bisect between 18 and 25 MB (Li=2)
ZSTD_TPU_WEXEC_NOCLAMP=1 timeout 900 python scripts/probe_lockstep.py 1024 1536 2
ZSTD_TPU_WEXEC_NOCLAMP=1 timeout 900 python scripts/probe_lockstep.py 1024 1280 2
# Li=1 past the validated 16.8 MB/lane
ZSTD_TPU_WEXEC_NOCLAMP=1 timeout 900 python scripts/probe_lockstep.py 1024 4096 1
ZSTD_TPU_WEXEC_NOCLAMP=1 timeout 900 python scripts/probe_lockstep.py 1024 8192 1
echo "=== done ==="
