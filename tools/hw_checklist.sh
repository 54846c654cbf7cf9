#!/bin/bash
# First-contact hardware checklist (docs/PERF_NOTES.md): run top-to-bottom
# the moment the TPU tunnel answers. Gates first, then the bench matrix.
# Logs to /tmp/hw_checklist_<ts>.log; keeps going on per-step failures so
# one regression doesn't hide the rest of the picture.
set -u
cd "$(dirname "$0")/.."
LOG="/tmp/hw_checklist_$(date +%s).log"
echo "# logging to $LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1800 "$@" 2>&1 | tee -a "$LOG"
  echo "=== exit $? ===" | tee -a "$LOG"
}

# 0) tunnel answers?
run python -c "import jax; print(jax.devices()[0].device_kind)" || exit 1

# 1) Mosaic lowering + fast-vs-reference gates (incl. NEW gf4 prefill mm)
run make tpu-smoke

# 2) headline + gf4 decode matrix (slope method)
run python bench.py --model mistral7b --dtype fp8
run python bench.py --model mistral7b --dtype gf4
run python bench.py --model llama3-8b --dtype gf4
run python bench.py --model llama2-13b --dtype gf4 --kv fp8
run python bench.py --model llama2-13b --dtype fp8 --kv fp8
run python bench.py --model mixtral4x7b --dtype gf4
run python bench.py --model mistral7b --dtype fp8 --batch 8
run python bench.py --model mistral7b --dtype gf4 --batch 8

# 3) trace_table v2 on gf4 (VPU column + __stage tags on hardware)
run python tools/perf.py --synthetic mistral7b --dtype gf4 -n 32 \
    --trace /tmp/gf4_trace

# 4) serving-level numbers
run python tools/serve_bench.py --synthetic mistral7b --dtype fp8 \
    --batch 8 --requests 32 --prompt-len 128 --max-tokens 64

echo "# done: $LOG"
