"""Steady-state register() timing on the real chip, production shapes.

Usage: python /tmp/time_register.py [mode] [steps_or_ft]
  mode: network | instance   (default both)
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np

import oai_analysis_2_tpu  # compile cache
import jax

from oai_analysis_2_tpu.core.image import image_from_array
from oai_analysis_2_tpu.engine.registration import ICON_Registration

shape = (160, 384, 384)
rng = np.random.default_rng(0)
z, y, x = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape], indexing="ij")
c = (80.0, 211.0, 192.0)
rr = np.sqrt(((z - c[0]) * 2.4) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2)
shell = np.clip(1.0 - np.abs(rr - 61.0) / 3.0, 0, 1) * (y < c[1])
knee = image_from_array((shell * 0.8 + rng.uniform(0, 0.2, shape)).astype(np.float32),
                        spacing=(0.36, 0.36, 0.7))
atlas_np = np.roll(shell, (0, -5, 8), (0, 1, 2)) * 0.78 + rng.uniform(0, 0.22, shape)
atlas = image_from_array(atlas_np.astype(np.float32), spacing=(0.36, 0.36, 0.7))

configs = [
    ("network+ft20@(2,)", dict(mode="network", finetune_steps=20)),
    ("network+ft(2,1)x(20,40)@0.4", dict(mode="network", finetune_steps=[20, 40],
                                         finetune_scales=(2, 1), finetune_lr=0.4)),
    ("instance(80,60,40)", dict(mode="instance", instance_steps=(80, 60, 40))),
    ("instance(40,30,20)", dict(mode="instance", instance_steps=(40, 30, 20))),
]
sel = sys.argv[1] if len(sys.argv) > 1 else None
for name, kw in configs:
    if sel and sel not in name:
        continue
    reg = ICON_Registration(**kw)
    ts = []
    for i in range(4):
        t0 = time.time()
        phi = reg.register(knee, atlas)
        jax.block_until_ready(phi.field)
        ts.append(time.time() - t0)
    print(f"{name}: warm {ts[0]:.1f}s steady {sorted(ts[1:])[1]:.2f}s all={['%.2f'%t for t in ts]}",
          flush=True)
print("TIME_REGISTER_DONE")
