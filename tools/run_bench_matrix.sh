#!/usr/bin/env bash
# Record the full 6-config bench matrix (VERDICT r2 item 7) on the real chip.
# Each config prints one JSON line; results are appended with a date stamp so
# docs/PERFORMANCE.md can carry the measured matrix.
set -u
cd "$(dirname "$0")/.."
out="${1:-docs/bench_matrix.jsonl}"
for cfg in svd_depth svd_softedge_sparse i2vgenxl_depth i2vgenxl_multi sdxl_depth train_step; do
  echo "=== $cfg" >&2
  # Full kernel-numerics sweep on the first config only: the recorded matrix
  # always rides on a chip-verified kernel set (GN + fused LN-FF + fused
  # temporal), while later configs reuse the already-verified kernels and skip
  # the expensive standalone Mosaic recompiles (VERDICT r3 weak #3).
  extra=""
  if [ "$cfg" = "svd_depth" ]; then extra="--full_selfcheck"; fi
  # Full stderr (selfcheck pass/fail lines, compile timings) is preserved in a
  # committed sidecar log so the recorded matrix carries its numerics evidence.
  # Write stderr to the log SYNCHRONOUSLY (a `2> >(tee ...)` process
  # substitution is not waited on by bash: blocks from one config could land
  # after the next config's header, and the final config's tail could be lost)
  # and echo the per-config header into the log too so blocks are attributable.
  log="${out%.jsonl}_log.txt"
  echo "=== $cfg $(date -u +%FT%TZ)" >> "$log"
  line=$(timeout 2400 python bench.py --config "$cfg" $extra 2>> "$log" | tail -1)
  tail -3 "$log" >&2
  if [ -n "$line" ]; then
    echo "{\"date\": \"$(date -u +%F)\", \"config\": \"$cfg\", \"result\": $line}" >> "$out"
    echo "$line"
  else
    echo "{\"date\": \"$(date -u +%F)\", \"config\": \"$cfg\", \"result\": null}" >> "$out"
    echo "(no result for $cfg)" >&2
  fi
done
