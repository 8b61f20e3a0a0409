#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache
run() {
  echo "=== $* ==="
  timeout 1200 python examples/validate_registration.py "$@" 2>&1 | grep -E "vol \(|field error|image MSE"
}
run --network 20                                   # production baseline
run --network 20 --ft-scales 2,1 --ft-lr 0.4       # deeper ft
run                                                # instance full (80,60,40)
run --network 30,20,15 --ft-scales 4,2,1 --ft-lr 1.2   # warm-start instance
run --network 40,30,20 --ft-scales 4,2,1 --ft-lr 1.2   # warm-start instance, deeper
echo ALL_DONE
