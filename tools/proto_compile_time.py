#!/usr/bin/env python3
"""Cold-compile time of the stream program variants.
Usage: proto_compile_time.py {fold|super2|super8|sorted} [b]
Each run should use a FRESH SHOTGUN_TPU_CACHE_DIR."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from shotgun_tpu.index.build import build_index
from shotgun_tpu.models import pipeline as pl
from shotgun_tpu.ops.encode import pack_codes_2bit
from shotgun_tpu.reference import KmerReference
from shotgun_tpu.utils.synth import synth_genomes, synth_reads

mode = sys.argv[1]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
K, L = 31, 150
rng = np.random.default_rng(7)
genomes = synth_genomes(rng, 3, 30_000)
reads = synth_reads(rng, genomes, B * 8, L)
idx = build_index(genomes, K)
ref = KmerReference(K, _index=idx)
tab = ref.device_probe_tables()
member = jnp.asarray(ref.set_member_dense())
lpad = ((L + 31) // 32) * 32
codes = np.zeros((B * 8, lpad), dtype=np.uint8)
codes[:, :L] = reads.codes
codes_p = pack_codes_2bit(codes)
qual_d = jnp.asarray(np.zeros((B, 1), np.uint8))
zero, one = jnp.int32(0), jnp.int32(1)
kw = dict(k=K, has_mrq=False, has_mkq=False, has_mg=False, packed=True)
carry = pl.init_fold_carry(int(member.shape[1]))

t0 = time.perf_counter()
if mode == "fold":
    out = pl.align_fold_batch(
        carry, tab, member, jnp.asarray(codes_p[:B]), qual_d,
        jnp.asarray(reads.lengths[:B]), one, one, zero, zero, zero, **kw)
elif mode in ("super2", "super8"):
    S = 2 if mode == "super2" else 8
    out = pl.align_fold_superbatch(
        carry, tab, member,
        jnp.asarray(codes_p[:S * B].reshape(S, B, -1)), qual_d,
        jnp.asarray(reads.lengths[:S * B].reshape(S, B)),
        one, one, zero, zero, zero, **kw)
elif mode == "sorted":
    rv = jnp.ones(B, dtype=bool)
    out = pl.align_batch(
        tab, member, jnp.asarray(codes_p[:B]), qual_d,
        jnp.asarray(reads.lengths[:B]), rv, one, one, zero, zero, zero,
        with_aggregate=True, **kw)
jax.block_until_ready(out)
print(f"{mode} b={B}: compile+first {time.perf_counter() - t0:.2f}s")
