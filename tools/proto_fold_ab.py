#!/usr/bin/env python3
"""A/B: _sorted_align (headline program) vs align_fold_batch (stream
program) vs align_fold_superbatch at S=2, same inputs, real device."""

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

K, B, L = 31, 16384, 150
N_BATCH = 16
rng = np.random.default_rng(0)
genomes = synth_genomes(rng, 5, 200_000)
reads = synth_reads(rng, genomes, B * N_BATCH, L)
idx = build_index(genomes, K)
ref = KmerReference(K, _index=idx)
tab = ref.device_probe_tables("sort")
member = jnp.asarray(ref.set_member_dense())
lpad = ((L + 31) // 32) * 32

codes = np.zeros((B * N_BATCH, lpad), dtype=np.uint8)
codes[:, :L] = reads.codes
codes_p = pack_codes_2bit(codes)
staged = [(jnp.asarray(codes_p[i * B:(i + 1) * B]),
           jnp.asarray(reads.lengths[i * B:(i + 1) * B]))
          for i in range(N_BATCH)]
jax.block_until_ready(staged)
qual_d = jnp.asarray(np.zeros((B, 1), dtype=np.uint8))
zero, one = jnp.int32(0), jnp.int32(1)
rv = jnp.ones(B, dtype=bool)
kw = dict(k=K, has_mrq=False, has_mkq=False, has_mg=False, packed=True)

# a) headline: align_batch with aggregate
def run_a():
    outs = [pl.align_batch(tab, member, c, qual_d, l, rv,
                           one, one, zero, zero, zero,
                           with_aggregate=True, **kw)[1]
            for c, l in staged]
    jax.block_until_ready(outs)

run_a()
t0 = time.perf_counter()
run_a()
dt = time.perf_counter() - t0
print(f"a) align_batch+agg     {dt:.3f}s  {B * N_BATCH / dt:,.0f} reads/s")

# b) stream program: align_fold_batch (donated carry)
def run_b():
    carry = pl.init_fold_carry(member.shape[1])
    for c, l in staged:
        carry = pl.align_fold_batch(carry, tab, member, c, qual_d, l,
                                    one, one, zero, zero, zero, **kw)
    jax.block_until_ready(carry)

run_b()
t0 = time.perf_counter()
run_b()
dt = time.perf_counter() - t0
print(f"b) align_fold_batch    {dt:.3f}s  {B * N_BATCH / dt:,.0f} reads/s")

# c) superbatch S=2
S = 2
sb = [(jnp.asarray(codes_p[i * B * S:(i + 1) * B * S].reshape(S, B, -1)),
       jnp.asarray(reads.lengths[i * B * S:(i + 1) * B * S].reshape(S, B)))
      for i in range(N_BATCH // S)]
jax.block_until_ready(sb)

def run_c():
    carry = pl.init_fold_carry(member.shape[1])
    for c, l in sb:
        carry = pl.align_fold_superbatch(carry, tab, member, c, qual_d, l,
                                         one, one, zero, zero, zero, **kw)
    jax.block_until_ready(carry)

run_c()
t0 = time.perf_counter()
run_c()
dt = time.perf_counter() - t0
print(f"c) superbatch S=2      {dt:.3f}s  {B * N_BATCH / dt:,.0f} reads/s")
