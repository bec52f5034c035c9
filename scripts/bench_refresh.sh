#!/bin/bash
# Full benchmark refresh on the real TPU chip — the analog of the
# reference's parallel-final/final.sh (all matrices x krylov dims).
# Run from the repo root.  Appends JSON-line records to bench_results/.
# Packs are expected pre-warmed (python -m tpu_lanczos.eval.prewarm);
# cold packs are built on the fly but inflate wall time.
set -uo pipefail
cd "$(dirname "$0")/.."
STAMP=$(date +%Y%m%d_%H%M%S)
echo "== waiting for TPU" >&2
until python - <<'EOF'
import time
t0 = time.time()
import jax
d = jax.devices()
print(f"TPU up after {time.time()-t0:.0f}s: {d}", flush=True)
EOF
do
  echo "TPU not up yet ($(date +%H:%M:%S)); retrying in 5 min" >&2
  sleep 300
done

echo "== library surface drive (verify recipe)" >&2
python - <<'EOF' || exit 1
import numpy as np, tpu_lanczos as tl
g = tl.generators.barabasi_albert(20000, 10, seed=42)
res = tl.expm_action(g, k=40, dtype="float32", log_scale=True)
assert np.all(np.isfinite(res.ans))
from tpu_lanczos.eval import oracle
ref = oracle.expm_action(g, np.ones(g.n), 40)
a = res.ans / np.linalg.norm(res.ans); b = ref / np.linalg.norm(ref)
err = np.linalg.norm(a - b)
top = len(set(np.argsort(res.ans)[-20:]) & set(np.argsort(ref)[-20:]))
print(f"surface drive: rel err {err:.2e} top-20 overlap {top}", flush=True)
assert err < 1e-4 and top >= 19
EOF

echo "== headline bench" >&2
python bench.py | tee -a "bench_results/headline_${STAMP}.jsonl" || exit 1

echo "== suite k=50" >&2
python -m tpu_lanczos.eval.bench_suite --k 50 \
  | tee -a bench_results/suite_r2_k50.jsonl || exit 1

echo "== suite k=100" >&2
python -m tpu_lanczos.eval.bench_suite --k 100 \
  --only ba_1M_m10,stencil_2600,channel_3d,copapers_540k,rmat_540k_e15M,rmat_4M_e35M,ba_4M_m9 \
  | tee -a bench_results/suite_r2_k100.jsonl || exit 1

echo "== done ($STAMP)" >&2
