#!/usr/bin/env python3
"""Replicate align_stream's exact loop with per-phase wall timers:
fill-wait (prefetch get), host->device transfers, dispatch, final fetch.
Toggles: PREFETCH=0/1, VALIDATE=0/1, SB=n."""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from shotgun_tpu.aligner import _prefetch_iter
from shotgun_tpu.index.build import build_index
from shotgun_tpu.io.data_file import open_fastq_stream
from shotgun_tpu.models.pipeline import align_fold_superbatch, init_fold_carry
from shotgun_tpu.reference import KmerReference
from shotgun_tpu.utils.synth import synth_genomes, synth_reads, to_fastq

K, B, L = 31, 16384, 150
N = 262_144
SB = int(os.environ.get("SB", "8"))
PREFETCH = os.environ.get("PREFETCH", "1") == "1"
VALIDATE = os.environ.get("VALIDATE", "1") == "1"

rng = np.random.default_rng(0)
genomes = synth_genomes(rng, 5, 200_000)
reads = synth_reads(rng, genomes, N, L)
idx = build_index(genomes, K)
ref = KmerReference(K, _index=idx)

fq_dir = tempfile.mkdtemp()
fq_path = os.path.join(fq_dir, "bench.fq")
with open(fq_path, "wb") as f:
    f.write(to_fastq(reads).encode())

lpad = ((L + 31) // 32) * 32
tab = ref.device_probe_tables()
member = jnp.asarray(ref.set_member_dense())
dummy_q = jnp.asarray(np.zeros((B, 1), np.uint8))
zero, one = jnp.int32(0), jnp.int32(1)
kw = dict(k=K, has_mrq=False, has_mkq=False, has_mg=False, packed=True)


def run(label):
    t_all0 = time.perf_counter()
    stream = open_fastq_stream(fq_path, lazy=True)
    if VALIDATE:
        stream.start_validation()
    carry = init_fold_carry(int(member.shape[1]))
    chunk_iter = stream.chunks_packed(B * SB, lpad, False)
    if PREFETCH:
        chunk_iter = _prefetch_iter(chunk_iter)
    t_fill = t_xfer = t_disp = 0.0
    nb = 0
    it = iter(chunk_iter)
    while True:
        t0 = time.perf_counter()
        try:
            codes_p, qual, lengths, got = next(it)
        except StopIteration:
            break
        t_fill += time.perf_counter() - t0
        t0 = time.perf_counter()
        cd = jnp.asarray(codes_p.reshape(SB, B, -1))
        ld = jnp.asarray(lengths.reshape(SB, B))
        t_xfer += time.perf_counter() - t0
        t0 = time.perf_counter()
        carry = align_fold_superbatch(
            carry, tab, member, cd, dummy_q, ld,
            one, one, zero, zero, zero, **kw)
        t_disp += time.perf_counter() - t0
        nb += 1
    if VALIDATE:
        stream.finish_validation()
    t0 = time.perf_counter()
    got = jax.device_get(carry)
    t_fetch = time.perf_counter() - t0
    dt = time.perf_counter() - t_all0
    print(f"{label}: total {dt:.3f}s ({N / dt:,.0f} r/s) | "
          f"fill-wait {t_fill:.3f} xfer {t_xfer:.3f} "
          f"dispatch {t_disp:.3f} fetch {t_fetch:.3f} ({nb} chunks)")


run("warm-compile")
run("steady     ")
run("steady     ")
