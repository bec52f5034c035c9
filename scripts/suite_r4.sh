#!/bin/bash
# Round-4 suite refresh: k=50 + k=100 with the per-row accuracy column.
set -uo pipefail
cd "$(dirname "$0")/.."
echo "== suite k=50 ($(date +%H:%M:%S))" >&2
python -m tpu_lanczos.eval.bench_suite --k 50 \
  2> >(tee -a bench_results/suite_r4_k50.log >&2) \
  | tee -a bench_results/suite_r4_k50.jsonl || exit 1
echo "== suite k=100 ($(date +%H:%M:%S))" >&2
python -m tpu_lanczos.eval.bench_suite --k 100 \
  --only ba_1M_m10,stencil_2600,channel_3d,copapers_540k,rmat_540k_e15M,rmat_4M_e35M,ba_4M_m9 \
  2> >(tee -a bench_results/suite_r4_k100.log >&2) \
  | tee -a bench_results/suite_r4_k100.jsonl || exit 1
echo "== suite done ($(date +%H:%M:%S))" >&2
