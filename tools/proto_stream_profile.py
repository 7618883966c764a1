#!/usr/bin/env python3
"""Where does align_stream's wall time go?  Times with REAL syncs
(device_get) only: (1) host fill only, (2) dispatch-only + final fetch,
using fresh data each phase."""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from shotgun_tpu.aligner import PseudoAlignment
from shotgun_tpu.index.build import build_index
from shotgun_tpu.io.data_file import open_fastq_stream
from shotgun_tpu.reference import KmerReference
from shotgun_tpu.utils.synth import synth_genomes, synth_reads, to_fastq

K, B, L = 31, 16384, 150
N = 262_144
rng = np.random.default_rng(0)
genomes = synth_genomes(rng, 5, 200_000)
reads = synth_reads(rng, genomes, N, L)
idx = build_index(genomes, K)
ref = KmerReference(K, _index=idx)

fq_dir = tempfile.mkdtemp()
fq_path = os.path.join(fq_dir, "bench.fq")
with open(fq_path, "wb") as f:
    f.write(to_fastq(reads).encode())

# 1) host fill only: consume the native packed chunk iterator
lpad = ((L + 31) // 32) * 32
sb = 2
t0 = time.perf_counter()
stream = open_fastq_stream(fq_path, lazy=True)
stream.start_validation()
tot = 0
for codes_p, qual, lengths, got in stream.chunks_packed(B * sb, lpad, False):
    tot += got
stream.finish_validation()
t_fill = time.perf_counter() - t0
print(f"host fill only: {t_fill:.3f}s ({tot / t_fill:,.0f} reads/s)")

# 2) warm the executables on a fresh alignment (compiles cached on disk)
warm = PseudoAlignment(ref)
warm.align_stream(open_fastq_stream(fq_path, lazy=True), 1, 1, batch_size=B)

# 3) full timed stream (what bench measures)
t0 = time.perf_counter()
alignment = PseudoAlignment(ref)
alignment.align_stream(open_fastq_stream(fq_path, lazy=True), 1, 1,
                       batch_size=B)
summary = alignment.get_summary()
t_e2e = time.perf_counter() - t0
print(f"align_stream e2e: {t_e2e:.3f}s ({N / t_e2e:,.0f} reads/s) "
      f"unique={summary['Statistics']['unique_mapped_reads']}")

# 4) device-only honest: pre-fill all superbatch arrays, then time
#    dispatch + final carry fetch
from shotgun_tpu.models.pipeline import (
    align_fold_superbatch, init_fold_carry)

chunks = []
stream = open_fastq_stream(fq_path, lazy=True)
for codes_p, qual, lengths, got in stream.chunks_packed(B * sb, lpad, False):
    chunks.append((codes_p.reshape(sb, B, -1).copy(),
                   lengths.reshape(sb, B).copy()))
tab = ref.device_probe_tables()
member = jnp.asarray(ref.set_member_dense())
dummy_q = jnp.asarray(np.zeros((B, 1), np.uint8))
zero, one = jnp.int32(0), jnp.int32(1)
kw = dict(k=K, has_mrq=False, has_mkq=False, has_mg=False, packed=True)

t0 = time.perf_counter()
carry = init_fold_carry(int(member.shape[1]))
for codes_p, lengths in chunks:
    carry = align_fold_superbatch(
        carry, tab, member, jnp.asarray(codes_p), dummy_q,
        jnp.asarray(lengths), one, one, zero, zero, zero, **kw)
got = jax.device_get(carry)
t_dev = time.perf_counter() - t0
print(f"transfer+dispatch+fetch: {t_dev:.3f}s ({N / t_dev:,.0f} reads/s) "
      f"counters={got.counters[:3]}")
