"""Stage-level microbenchmark of the align pipeline on the attached device.

Times each pipeline stage as a separate jitted function to locate the
bottleneck.  Usage: python tests/tools/bench_micro.py [batch] [n_iter]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from shotgun_tpu.index.build import build_index, pack_key64
from shotgun_tpu.index.hashtable import build_probe_table
from shotgun_tpu.models.pipeline import align_batch_core, aggregate_batch
from shotgun_tpu.ops.encode import rolling_encode_jnp, window_quality_sums
from shotgun_tpu.ops.probe import probe_kmers
from shotgun_tpu.reference import KmerReference
from shotgun_tpu.utils.synth import synth_genomes, synth_reads

K = 31
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
N_ITER = int(sys.argv[2]) if len(sys.argv) > 2 else 8
L = 150
W = L - K + 1


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITER
    print(f"{name:34s} {dt * 1e3:9.2f} ms  {B / dt / 1e6:8.2f} M reads/s")
    return out


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    genomes = synth_genomes(rng, 5, 200_000)
    reads = synth_reads(rng, genomes, B, L)
    idx = build_index(genomes, K)
    ref = KmerReference(K, _index=idx)
    pt = ref.probe_table()
    member = ref.set_member_dense()
    print(f"kmers={idx.num_kmers} buckets={pt.n_buckets} "
          f"stash={pt.stash.shape[0]} sets={idx.num_sets}")

    table_d = jnp.asarray(pt.table)
    member_d = jnp.asarray(member)
    codes_d = jnp.asarray(reads.codes)
    qual_d = jnp.asarray(reads.qual)
    len_d = jnp.asarray(reads.lengths)
    rv_d = jnp.ones(B, dtype=bool)

    # sorted key array for the searchsorted variant
    keys_sorted = pack_key64(idx.kmer_lo, idx.kmer_hi)
    klo_d = jnp.asarray(idx.kmer_lo)
    khi_d = jnp.asarray(idx.kmer_hi)
    sid_d = jnp.asarray(idx.set_id)
    gc_d = jnp.asarray(idx.genome_counts().astype(np.int32))

    encode = jax.jit(lambda c: rolling_encode_jnp(c, K))
    lo, hi = timeit("rolling_encode", encode, codes_d)

    qsums = jax.jit(lambda q: window_quality_sums(q, K))
    timeit("window_quality_sums", qsums, qual_d)

    stash_d = jnp.asarray(pt.stash)
    probe = jax.jit(lambda t, s, a, b: probe_kmers(t, s, a, b))
    hit, sid, gcount, slot_pos = timeit(
        "probe (single gather)", probe, table_d, stash_d, lo, hi)

    def probe_ss(klo, khi, sidv, gcv, lo, hi):
        # binary search on (hi, lo) sorted pairs without 64-bit ints
        n = klo.shape[0]
        lo32 = lo
        hi32 = hi
        lo_idx = jnp.zeros(lo.shape, jnp.int32)
        hi_idx = jnp.full(lo.shape, n, jnp.int32)
        for _ in range(int(np.ceil(np.log2(max(n, 2)))) + 1):
            mid = (lo_idx + hi_idx) // 2
            mlo = jnp.take(klo, mid)
            mhi = jnp.take(khi, mid)
            less = (mhi < hi32) | ((mhi == hi32) & (mlo < lo32))
            lo_idx = jnp.where(less, mid + 1, lo_idx)
            hi_idx = jnp.where(less, hi_idx, mid)
        pos = jnp.minimum(lo_idx, n - 1)
        found = (jnp.take(klo, pos) == lo32) & (jnp.take(khi, pos) == hi32)
        return found, jnp.where(found, jnp.take(sidv, pos), -1), \
            jnp.where(found, jnp.take(gcv, pos), 0)

    # note: klo/khi sorted by (hi, lo)? pack_key64 sorts by full key =
    # hi<<32|lo which IS (hi, lo) lexicographic. OK.
    probe_ss_j = jax.jit(lambda a, b, c, d, e, f: probe_ss(a, b, c, d, e, f))
    timeit("probe (searchsorted)", probe_ss_j,
           klo_d, khi_d, sid_d, gc_d, lo, hi)

    stored = hit

    def dedupe(slot_pos, stored):
        eq = slot_pos[:, :, None] == slot_pos[:, None, :]
        prev = (
            jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
            < jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        )
        dup = jnp.any(eq & stored[:, None, :] & prev[None], axis=2)
        return stored & ~dup

    dedupe_j = jax.jit(dedupe)
    first_occ = timeit("dedupe (slot_pos)", dedupe_j, slot_pos, stored)

    def counts(sid, stored, first_occ, gcount):
        mem = jnp.take(member_d, jnp.where(stored, sid, 0), axis=0)
        mem_f = mem.astype(jnp.float32)
        spec_w = first_occ & (gcount == 1)
        sc = jnp.einsum("bwr,bw->br", mem_f, spec_w.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        tc = jnp.einsum("bwr,bw->br", mem_f, first_occ.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, lo.shape, 1)
        big = jnp.int32(0x3FFFFFFF)
        in_set = mem > 0
        fw_s = jnp.min(jnp.where(spec_w[:, :, None] & in_set,
                                 w_iota[:, :, None], big), axis=1)
        fw_t = jnp.min(jnp.where(first_occ[:, :, None] & in_set,
                                 w_iota[:, :, None], big), axis=1)
        return sc, tc, fw_s, fw_t

    counts_j = jax.jit(counts)
    timeit("counts+fw", counts_j, sid, stored, first_occ, gcount)

    full = jax.jit(lambda *a: align_batch_core(
        *a, k=K, has_mrq=False, has_mkq=False, has_mg=False))
    res = timeit("FULL align_batch_core", full,
                 table_d, stash_d, member_d, codes_d, qual_d, len_d,
                 jnp.int32(1), jnp.int32(1), jnp.int32(0), jnp.int32(0),
                 jnp.int32(0))

    agg_j = jax.jit(aggregate_batch)
    timeit("aggregate_batch", agg_j, res, rv_d)


if __name__ == "__main__":
    main()
