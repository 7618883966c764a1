import time
import numpy as np
from shotgun_tpu.utils.synth import synth_genomes
from shotgun_tpu.index.build import build_index
rng = np.random.default_rng(0)
g = synth_genomes(rng, 5, 200_000)
build_index(g, 31)
best=0
for rep in range(6):
    t0=time.perf_counter()
    build_index(g, 31)
    best=max(best, 1/(time.perf_counter()-t0))
print(f"build_index best: {best:.1f} Mbp/s")
