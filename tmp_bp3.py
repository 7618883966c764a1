import time
import numpy as np
from shotgun_tpu.utils.synth import synth_genomes
from shotgun_tpu.index.build import build_index
from shotgun_tpu.io import native
rng = np.random.default_rng(0)
g = synth_genomes(rng, 5, 200_000)
build_index(g, 31)
for rep in range(4):
    t0=time.perf_counter(); native.build_kmer_index(g.codes, g.offsets, 31); t1=time.perf_counter()
    build_index(g, 31); t2=time.perf_counter()
    print(f"native {1/(t1-t0):5.1f} | build_index {1/(t2-t1):5.1f} Mbp/s")
