#!/bin/bash
# A/B the gated kernel paths on the real chip: one bench.py subprocess per env
# combo (env gates are read at trace time; fresh process = fresh jit caches).
# Usage: bash scripts/ab_flags.sh [extra bench args...]
# Results appended to /tmp/ab_results.jsonl, one line per combo.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/ab_results.jsonl
: > "$OUT"
run() {
  local name="$1"; shift
  echo "=== $name ($*) ===" >&2
  local line
  # ${EXTRA[@]+...}: empty-array expansion is an unbound error under set -u on bash < 4.4
  line=$(env HICOM_SKIP_PROBE=1 "$@" timeout 900 python bench.py --no-cache ${EXTRA[@]+"${EXTRA[@]}"} 2>/tmp/ab_last.err | tail -1)
  echo "{\"combo\": \"$name\", \"result\": ${line:-null}}" >> "$OUT"
  echo "$line" >&2
}
EXTRA=("$@")
run baseline           # full-block flash incl. d=72 towers (default)
run no_gqa_fold        HICOM_FLASH_GQA=0
run fused_local        HICOM_FUSED_LOCAL=1
run no_fullblock       HICOM_FLASH_FULLBLOCK_MAX=0              # d=72 -> einsum, d%64==0 -> 256-block flash
run d72_256blocks      HICOM_FLASH_FULLBLOCK_MAX=0 HICOM_FLASH_MIN_LANE=8  # the known-bad multi-block d=72 config
cat "$OUT"
