import os, time
os.environ["STPU_BUILD_DEBUG"] = "1"
import numpy as np
from shotgun_tpu.utils.synth import synth_genomes
from shotgun_tpu.io import native
rng = np.random.default_rng(0)
g = synth_genomes(rng, 5, 200_000)
native.build_kmer_index(g.codes, g.offsets, 31)
best=0
for rep in range(5):
    t0=time.perf_counter()
    native.build_kmer_index(g.codes, g.offsets, 31)
    best=max(best, 1/(time.perf_counter()-t0))
print(f"best: {best:.1f} Mbp/s")
