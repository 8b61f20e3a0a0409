#!/bin/bash
# w24 from-scratch training, proven recipe (sup 1.0 / sim 0.1, zero-init
# heads), 3 warm-restart cycles 3e-4 -> 1.5e-4 -> 8e-5.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache
export GRADICON_WIDTH=24
export GRADICON_SUP_W=1.0 GRADICON_SIM_W=0.1
OUT=/tmp/gradicon_w24f/gradicon.npz
mkdir -p /tmp/gradicon_w24f
best() { cat $OUT.best 2>/dev/null || echo inf; }
set -x
GRADICON_LR=3e-4 GRADICON_BEST=inf timeout 7200 python examples/train_gradicon_synthetic.py 600 2 $OUT
GRADICON_LR=1.5e-4 GRADICON_RESUME=$OUT GRADICON_BEST=$(best) timeout 7200 python examples/train_gradicon_synthetic.py 600 2 $OUT
GRADICON_LR=8e-5 GRADICON_RESUME=$OUT GRADICON_BEST=$(best) timeout 7200 python examples/train_gradicon_synthetic.py 600 2 $OUT
echo TRAIN_DONE best=$(best)
