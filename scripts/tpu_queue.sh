#!/bin/bash
# Wait for the tunnel, then run the FULL round-4 TPU measurement queue.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/honerf_jax_cache
while true; do
  timeout 240 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((8,128)).sum()))
" > /tmp/tpu_probe_out.txt 2>&1
  grep -q "1024.0" /tmp/tpu_probe_out.txt && break
  date >> /tmp/tpu_queue.log
  sleep 120
done
echo "TPU BACK $(date)" >> /tmp/tpu_queue.log
date > /tmp/tpu_back.txt
run() {  # run <tag> <timeout> <cmd...>
  echo "=== $1 ($(date +%H:%M:%S)) ===" >> /tmp/tpu_queue.log
  timeout "$2" "${@:3}" >> /tmp/tpu_queue.log 2>&1
  echo "$1 rc=$?" >> /tmp/tpu_queue.log
}
run ablation       5400 python scripts/bench_fine_ablate.py
run bench-piece    7200 python bench.py
run bench-slot     7200 env HONERF_FINE_LAYOUT=slot python bench.py
run ladder-sweep   5400 python scripts/bench_fused_hand.py
run fit-e2e-fine   5400 python scripts/bench_fit_e2e.py 1 2 fine
run qfit-gates     7200 python scripts/quality_fit_fused.py ladder ladder_fine
run video-e2e      5400 python scripts/bench_video_e2e.py 4 3
run soak-30k      21600 python scripts/soak_resume.py obj 30000
echo "QUEUE DONE $(date)" >> /tmp/tpu_queue.log
