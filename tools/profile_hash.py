#!/usr/bin/env python3
"""Per-stage device timing of the HASH probe path (split-dispatch form).

Compares against tools/profile_stages.py (sorted path) to find where the
hash path loses its A/B.  Usage: python tools/profile_hash.py [iters]
"""

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
    pack_codes_2bit,
    rolling_encode_jnp,
    unpack_codes_2bit,
)
from shotgun_tpu.ops.probe import HashTableDev, hash_probe_gather, resolve_rows
from shotgun_tpu.reference import KmerReference
from shotgun_tpu.utils.synth import synth_genomes, synth_reads

K = int(os.environ.get("BENCH_K", 31))
B = int(os.environ.get("BENCH_BATCH", 16384))
L = 150
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def timed(label, fn, *args, jit=True):
    jfn = jax.jit(fn) if jit else fn
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jfn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:34s} {ms:8.3f} ms")
    return ms


def main():
    print(f"device: {jax.devices()[0]}  B={B} L={L} K={K}")
    rng = np.random.default_rng(0)
    genomes = synth_genomes(rng, 5, 200_000)
    reads = synth_reads(rng, genomes, B, L)
    idx = build_index(genomes, K)
    ref = KmerReference(K, _index=idx)
    pt = build_probe_table(idx.kmer_lo, idx.kmer_hi, idx.set_id,
                           idx.genome_counts())
    tab = HashTableDev(table=jnp.asarray(pt.table),
                       stash=jnp.asarray(pt.stash))
    member = jnp.asarray(ref.set_member_dense())
    print(f"buckets: {pt.n_buckets:,} x {pt.table.shape[1]} slots, "
          f"stash={pt.stash.shape[0]}, {pt.table.nbytes / 1e6:.1f} MB")

    lpad = ((L + 31) // 32) * 32
    codes = np.zeros((B, lpad), dtype=np.uint8)
    codes[:, :L] = reads.codes
    lengths = jnp.asarray(reads.lengths)
    codes_p = jnp.asarray(pack_codes_2bit(codes))
    qual_d = jnp.asarray(np.zeros((B, 1), dtype=np.uint8))

    # --- stage 1: the standalone gather dispatch ---
    t_g = timed("1 hash_probe_gather (dispatch)",
                lambda c: hash_probe_gather(tab.table, c, k=K, packed=True),
                codes_p, jit=False)
    rows, bidx = hash_probe_gather(tab.table, codes_p, k=K, packed=True)
    rows = jax.block_until_ready(rows)
    print(f"   rows buffer: {rows.nbytes / 1e6:.0f} MB")

    def enc(codes_p):
        c = unpack_codes_2bit(codes_p)
        return rolling_encode_jnp(c, K)
    lo, hi = jax.jit(enc)(codes_p)

    # --- stage 2: resolve (XLA vs Pallas per current default) ---
    t_r = timed("2 resolve_rows", resolve_rows, rows, bidx, tab.stash, lo, hi)
    hit, sid, gc, slot = jax.jit(resolve_rows)(rows, bidx, tab.stash, lo, hi)

    # --- stage 3: classify WITHOUT pre_first_occ (owns O(W^2) dedupe) ---
    zero = jnp.int32(0)
    one = jnp.int32(1)
    def classify(hit, sid, gc, slot, lengths):
        return pl.core_from_probe(
            (hit, sid, gc, slot), member, qual_d, lengths,
            one, one, zero, zero, zero,
            k=K, has_mrq=False, has_mkq=False, has_mg=False)
    t_c = timed("3 classify (incl W^2 dedupe)", classify,
                hit, sid, gc, slot, lengths)

    # --- dedupe block alone ---
    def dedupe(slot, hit):
        eq = slot[:, :, None] == slot[:, None, :]
        w = slot.shape[1]
        prev = (jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
                < jax.lax.broadcasted_iota(jnp.int32, (w, w), 0))
        dup = jnp.any(eq & hit[:, None, :] & prev[None], axis=2)
        return hit & ~dup
    t_d = timed("3a   W^2 dedupe alone", dedupe, slot, hit)

    res = jax.jit(classify)(hit, sid, gc, slot, lengths)
    rv = jnp.ones(B, dtype=bool)
    t_a = timed("4 aggregate_batch", pl.aggregate_batch, res, rv)

    print(f"\nsum: {t_g + t_r + t_c + t_a:.3f} ms"
          f"  -> reads/s {B / (t_g + t_r + t_c + t_a) * 1e3:,.0f}")


if __name__ == "__main__":
    main()
