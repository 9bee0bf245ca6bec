#!/usr/bin/env bash
# Full-suite runner that actually finishes on this 1-core host (VERDICT r4 #7).
#
# The monolithic `pytest tests/` exceeds a 10-minute wall budget here because the
# ~36 slow (compile-heavy) tests serialize behind one XLA-CPU compiler thread.
# This runner splits the suite into independently-bounded groups so a hang or a
# compile storm in one file cannot eat every other group's budget, and records
# the per-group wall time. The committed `.cache/jax_test` compile cache makes
# warm reruns take seconds per group — run this script once after any module
# change to re-warm it (tests/conftest.py pins the cache dir).
#
# Usage: tools/run_tests.sh [extra pytest args...]
# Appends a row per group to stdout and exits nonzero if any group failed.
set -u
cd "$(dirname "$0")/.."

fail=0
run_group() {
  local name="$1" budget="$2"; shift 2
  local t0=$SECONDS
  timeout "$budget" python -m pytest -q "$@" 2>&1 | tail -2 | sed "s/^/[$name] /"
  local rc=${PIPESTATUS[0]}
  local dt=$((SECONDS - t0))
  if [ "$rc" -ne 0 ]; then
    fail=1
    echo "[$name] FAILED rc=$rc after ${dt}s (budget ${budget}s)"
  else
    echo "[$name] ok in ${dt}s"
  fi
}

# group 1: every non-slow test (fast unit + parity layer)
run_group fast 900 tests/ -m "not slow"

# slow groups: one per compile-heavy family, each with its own budget
run_group towers     900 tests/test_tower_parity.py tests/test_ip_adapter.py \
                         tests/test_dpt_swin.py -m slow
run_group pipelines 1200 tests/test_video_pipelines.py tests/test_sdxl_pipeline.py \
                         -m slow
run_group golden     900 tests/test_golden_regression.py tests/test_release_roundtrip.py \
                         -m slow
# The train-step programs are the largest XLA-CPU executables in the suite;
# (de)serializing several of them in ONE pytest process has segfaulted inside
# jax's compilation cache (put/get_executable_and_time, observed twice at
# different tests) — run each training test in its own process instead.
for t in $(grep -oE '^def test_[a-z_0-9]+' tests/test_train_step.py | sed 's/def //'); do
  run_group "training:$t" 600 "tests/test_train_step.py::$t"
done
run_group scale_out 1200 tests/test_multi_device_generation.py \
                         tests/test_native_control_size.py -m slow
run_group convert    600 tests/test_convert_validate.py -m slow

exit $fail
