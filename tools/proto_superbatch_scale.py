#!/usr/bin/env python3
"""RPC-count scaling: time transfer+dispatch+fetch at S in {2,4,8,16}."""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from shotgun_tpu.index.build import build_index
from shotgun_tpu.io.data_file import open_fastq_stream
from shotgun_tpu.models.pipeline import align_fold_superbatch, init_fold_carry
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

lpad = ((L + 31) // 32) * 32
tab = ref.device_probe_tables()
member = jnp.asarray(ref.set_member_dense())
dummy_q = jnp.asarray(np.zeros((B, 1), np.uint8))
zero, one = jnp.int32(0), jnp.int32(1)
kw = dict(k=K, has_mrq=False, has_mkq=False, has_mg=False, packed=True)

for sb in (2, 4, 8, 16):
    chunks = []
    stream = open_fastq_stream(fq_path, lazy=True)
    for codes_p, qual, lengths, got in stream.chunks_packed(
            B * sb, lpad, False):
        chunks.append((codes_p.reshape(sb, B, -1).copy(),
                       lengths.reshape(sb, B).copy()))
    # compile warm (first dispatch at this S)
    carry = init_fold_carry(int(member.shape[1]))
    carry = align_fold_superbatch(
        carry, tab, member, jnp.asarray(chunks[0][0]), dummy_q,
        jnp.asarray(chunks[0][1]), one, one, zero, zero, zero, **kw)
    jax.device_get(carry)

    t0 = time.perf_counter()
    carry = init_fold_carry(int(member.shape[1]))
    for codes_p, lengths in chunks:
        carry = align_fold_superbatch(
            carry, tab, member, jnp.asarray(codes_p), dummy_q,
            jnp.asarray(lengths), one, one, zero, zero, zero, **kw)
    got = jax.device_get(carry)
    dt = time.perf_counter() - t0
    print(f"S={sb:3d}: {dt:.3f}s  {N / dt:>10,.0f} reads/s  "
          f"({len(chunks)} superbatches)")
