#!/bin/bash
# Refresh every stale BENCHMARKS.md table on the TPU (VERDICT r2 item 6):
# engine matrix + batch rows with the challenge-select kernel active,
# ring-degree scan extended to the MXU_MAX_N boundary (2048) and the
# NTT-only regime (4096/8192), the digit-matvec-vs-NTT crossover at 2048,
# and the single-proof latency decomposition.
#
# Every row is a FRESH python process (the axon tunnel's dispatch state and
# the RINGZK_* trace-time flags both demand it). Appends one labeled JSON
# line per run to the log. Expect ~2h wall-clock (tunnel setup ~5 min per
# process; compiles cached in .jax_cache after the first pass).
#
# Usage: bash scripts/refresh_benches.sh [logfile]
set -u
LOG="${1:-/tmp/refresh_benches.jsonl}"
cd "$(dirname "$0")/.."

run() {
  local label="$1"; shift
  echo "=== $label: $* [$(date +%H:%M:%S)]" >&2
  local out
  out=$(timeout 3600 "$@" 2>/tmp/refresh_last.err)
  local rc=$?
  # the captured stdout is only valid as a JSON value if it IS one line of
  # JSON; anything else (partial line after a crash, stray warnings, several
  # lines) would corrupt the whole JSONL log -- re-encode it as a string then
  python3 - "$label" "$rc" "$out" >> "$LOG" <<'EOF'
import json, sys
label, rc, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
try:
    result = json.loads(out) if out.strip() else None
except ValueError:
    result = {"unparsed_stdout": out}
print(json.dumps({"label": label, "rc": rc, "result": result}))
EOF
  echo "$label -> $out (rc=$rc)" >&2
}

# -- engine matrix at batch 8192 (challenge kernel at its default: ON) -------
run "matrix_mxu1_pallas1" python bench.py
run "matrix_mxu1_pallas0" env RINGZK_PALLAS=0 python bench.py
run "matrix_mxu0_pallas1" env RINGZK_MXU=0 python bench.py
run "matrix_mxu0_pallas0" env RINGZK_MXU=0 RINGZK_PALLAS=0 python bench.py

# -- batch rows (default engines) ---------------------------------------------
run "batch_2048"  python bench.py --batch 2048
run "batch_32768" python bench.py --batch 32768
run "batch_65536" python bench.py --batch 65536 --iters 5

# -- ring-degree scan (batch shrinks with N to bound HBM) ---------------------
run "nscan_128"        python bench.py --n 128
run "nscan_1024"       python bench.py --n 1024
run "nscan_2048"       python bench.py --n 2048
run "nscan_2048_nomxu" env RINGZK_MXU=0 python bench.py --n 2048
run "nscan_4096"       python bench.py --n 4096 --batch 2048
run "nscan_8192"       python bench.py --n 8192 --batch 1024 --iters 5

# -- challenge-signs-from-selection-keys A/B (headline config) ----------------
# Off-by-default transcript-changing variant (ROADMAP idea): one uint32 draw
# supplies both signs and selection keys. Measured twice to bound run noise.
run "signkey_on_a"  env RINGZK_CHALLENGE_SIGNKEY=1 python bench.py
run "signkey_on_b"  env RINGZK_CHALLENGE_SIGNKEY=1 python bench.py
run "signkey_off_a" python bench.py

# -- single-proof latency decomposition (BASELINE config 1) -------------------
run "latency" python scripts/latency_bench.py

echo "done; log at $LOG" >&2
