#!/usr/bin/env python3
"""Can the hash probe run FUSED in one dispatch without the gather-fusion
poison?  Times full-align variants at B=16384:

  a) split 2-dispatch (current hash path: gather program + finish program)
  b) fused 1-dispatch with optimization_barrier around the gathered rows
  c) current sorted-path fused program (baseline)

Also times b) at SLOTS=8 (denser table for bulk scale).
Usage: python tools/proto_fused_hash.py [iters]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from shotgun_tpu.index.build import build_index
from shotgun_tpu.index.hashtable import build_probe_table
from shotgun_tpu.models import pipeline as pl
from shotgun_tpu.ops.encode import (
    mix32,
    pack_codes_2bit,
    rolling_encode_jnp,
    unpack_codes_2bit,
)
from shotgun_tpu.ops.probe import HashTableDev, hash_probe_gather, resolve_rows
from shotgun_tpu.reference import KmerReference
from shotgun_tpu.utils.synth import synth_genomes, synth_reads

K = 31
B = int(os.environ.get("BENCH_BATCH", 16384))
L = 150
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def timed(label, jfn, *args):
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jfn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:44s} {ms:8.3f} ms   {B / ms * 1e3:>12,.0f} reads/s")
    return ms


def main():
    print(f"device: {jax.devices()[0]}  B={B} L={L} K={K}")
    rng = np.random.default_rng(0)
    genomes = synth_genomes(rng, 5, 200_000)
    reads = synth_reads(rng, genomes, B, L)
    idx = build_index(genomes, K)
    ref = KmerReference(K, _index=idx)
    member = jnp.asarray(ref.set_member_dense())

    lpad = ((L + 31) // 32) * 32
    codes = np.zeros((B, lpad), dtype=np.uint8)
    codes[:, :L] = reads.codes
    lengths = jnp.asarray(reads.lengths)
    codes_p = jnp.asarray(pack_codes_2bit(codes))
    qual_d = jnp.asarray(np.zeros((B, 1), dtype=np.uint8))
    zero, one = jnp.int32(0), jnp.int32(1)
    rv = jnp.ones(B, dtype=bool)

    def classify_agg(probe_res, lengths):
        res = pl.core_from_probe(
            probe_res, member, qual_d, lengths,
            one, one, zero, zero, zero,
            k=K, has_mrq=False, has_mkq=False, has_mg=False)
        return pl.aggregate_batch(res, rv)

    @jax.jit
    def finish(rows, bidx, stash, codes_p, lengths):
        c = unpack_codes_2bit(codes_p)
        lo, hi = rolling_encode_jnp(c, K)
        pr = resolve_rows(rows, bidx, stash, lo, hi)
        return classify_agg(pr, lengths)

    @jax.jit
    def fused(table, stash, codes_p, lengths):
        c = unpack_codes_2bit(codes_p)
        lo, hi = rolling_encode_jnp(c, K)
        bidx = (mix32(lo, hi, jnp)
                & jnp.uint32(table.shape[0] - 1)).astype(jnp.int32)
        bidx_b = jax.lax.optimization_barrier(bidx)
        rows = jnp.take(table, bidx_b, axis=0)
        rows = jax.lax.optimization_barrier(rows)
        pr = resolve_rows(rows, bidx, stash, lo, hi)
        return classify_agg(pr, lengths)

    for slots in (4, 8):
        pt = build_probe_table(idx.kmer_lo, idx.kmer_hi, idx.set_id,
                               idx.genome_counts(), slots_per_bucket=slots)
        tab = HashTableDev(table=jnp.asarray(pt.table),
                           stash=jnp.asarray(pt.stash))
        print(f"\nslots={slots}: {pt.n_buckets:,} buckets, "
              f"{pt.table.nbytes / 1e6:.0f} MB, stash={pt.stash.shape[0]}")

        def split(codes_p, lengths):
            rows, bidx = hash_probe_gather(tab.table, codes_p, k=K,
                                           packed=True)
            return finish(rows, bidx, tab.stash, codes_p, lengths)
        timed(f"a) split 2-dispatch slots={slots}", split, codes_p, lengths)
        timed(f"b) fused 1-dispatch slots={slots}", fused,
              tab.table, tab.stash, codes_p, lengths)
        agg = fused(tab.table, tab.stash, codes_p, lengths)
        print("   counters:", int(agg.n_unique), int(agg.n_ambiguous),
              int(agg.n_unmapped))

    # c) sorted-path baseline
    stab = ref.device_probe_tables("sort")

    @jax.jit
    def sorted_fused(stab, codes_p, lengths):
        res = pl.align_batch_core(
            stab, member, codes_p, qual_d, lengths,
            one, one, zero, zero, zero,
            k=K, has_mrq=False, has_mkq=False, has_mg=False, packed=True)
        return pl.aggregate_batch(res, rv)
    timed("c) sorted fused (current default)",
          functools.partial(sorted_fused, stab), codes_p, lengths)
    a = sorted_fused(stab, codes_p, lengths)
    print("   counters:", int(a.n_unique), int(a.n_ambiguous),
          int(a.n_unmapped))


if __name__ == "__main__":
    main()
