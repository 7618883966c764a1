#!/usr/bin/env python3
"""Phase profile of the device-side DB build (index/device_build.py v2)
on the attached accelerator: host prep / upload / fused compute / fetch,
plus the end-to-end ``KmerReference.from_device_build`` rate.

Usage: python tools/profile_devbuild.py [MBP ...]   (default: 1 32)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shotgun_tpu.utils.platform import configure_platform  # noqa: E402

configure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from shotgun_tpu.index.device_build import (  # noqa: E402
    _build_tables_v2,
    _host_prep,
    device_build_tables,
)
from shotgun_tpu.reference import KmerReference  # noqa: E402
from shotgun_tpu.utils.synth import synth_genomes  # noqa: E402

K = int(os.environ.get("PROF_K", 31))


def profile(mbp: int) -> None:
    rng = np.random.default_rng(0)
    n_rec = 8 if mbp >= 8 else 5
    genomes = synth_genomes(rng, n_rec, mbp * 1_000_000 // n_rec)
    pad_rows = KmerReference._pad_rows

    buf, gp = _host_prep(genomes, K, pad_rows)  # warm pages
    t0 = time.perf_counter()
    buf, gp = _host_prep(genomes, K, pad_rows)
    t_prep = time.perf_counter() - t0
    print(f"[{mbp} Mbp] host prep: {t_prep:.3f}s ({buf.nbytes / 1e6:.1f} MB)")

    r_t = jnp.int32(genomes.num_records)
    out = _build_tables_v2(jnp.asarray(buf), r_t, k=K, gp=gp)
    jax.device_get(out[4])
    print("compiled+warm")

    for it in range(3):
        b2 = buf.copy()  # fresh buffer: defeat dispatch elision
        t0 = time.perf_counter()
        d1 = jnp.asarray(b2)
        jax.block_until_ready(d1)
        t_up = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = _build_tables_v2(d1, r_t, k=K, gp=gp)
        jax.block_until_ready(out)
        t_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        scal = jax.device_get((out[4], out[5], out[6], out[7], out[8]))
        t_fetch = time.perf_counter() - t0
        tot = t_prep + t_up + t_run + t_fetch
        print(f"  iter{it}: prep {t_prep:.3f} upload {t_up:.3f} "
              f"compute {t_run:.3f} fetch {t_fetch:.3f} -> {tot:.3f}s "
              f"({mbp / tot:.1f} Mbp/s)  u={int(scal[0])} "
              f"multi={int(scal[1])} pairs={int(scal[2])}")

    # end-to-end (what bench.py measures)
    ref = KmerReference.from_device_build(genomes, K)
    t0 = time.perf_counter()
    ref = KmerReference.from_device_build(genomes, K)
    dt = time.perf_counter() - t0
    print(f"  from_device_build warm: {dt:.3f}s ({mbp / dt:.1f} Mbp/s, "
          f"{ref.index.num_kmers} kmers, {ref.index.num_sets} sets)")


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [1, 32]
    for mbp in sizes:
        profile(mbp)
