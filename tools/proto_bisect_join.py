#!/usr/bin/env python3
"""Bisect probe_dedupe_sorted: which piece costs 27 ms?  Times cumulative
prefixes of the join program on realistic operands."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from shotgun_tpu.index.build import build_index
from shotgun_tpu.ops.encode import pack_codes_2bit, rolling_encode_jnp, unpack_codes_2bit
from shotgun_tpu.ops.probe_sort2 import _bits_for, _shift_pack
from shotgun_tpu.reference import KmerReference
from shotgun_tpu.utils.synth import synth_genomes, synth_reads

K, B, L = 31, 16384, 150
ITERS = 10
_NEG1 = np.int32(-1)


def timed(label, jfn, args_list):
    out = jfn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = jfn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:44s} {ms:9.3f} ms")
    return ms


def main():
    rng = np.random.default_rng(0)
    genomes = synth_genomes(rng, 5, 200_000)
    reads = synth_reads(rng, genomes, B, L)
    idx = build_index(genomes, K)
    ref = KmerReference(K, _index=idx)
    tab = ref.device_probe_tables("sort")
    u = int(tab.klo.shape[0])
    lpad = ((L + 31) // 32) * 32
    w = lpad - K + 1
    n = B * w
    m = u + n
    print(f"u={u:,} n={n:,} m={m:,}")

    codes = np.zeros((B, lpad), dtype=np.uint8)
    codes[:, :L] = reads.codes
    lengths = jnp.asarray(reads.lengths)
    codes_p = jnp.asarray(pack_codes_2bit(codes))

    @jax.jit
    def prep(tab, codes_p, lengths):
        c = unpack_codes_2bit(codes_p)
        lo, hi = rolling_encode_jnp(c, K)
        ok = (jax.lax.broadcasted_iota(jnp.int32, (B, w), 1)
              < (lengths - jnp.int32(K - 1))[:, None])
        qkh, qkl = _shift_pack(lo.reshape(-1), hi.reshape(-1), 1)
        ones = jnp.uint32(0xFFFFFFFF)
        okf = ok.reshape(-1)
        qkh = jnp.where(okf, qkh, ones)
        qkl = jnp.where(okf, qkl, ones)
        tkh, tkl = _shift_pack(tab.klo, tab.khi, 0)
        ckh = jnp.concatenate([tkh, qkh])
        ckl = jnp.concatenate([tkl, qkl])
        val = jnp.concatenate([
            jnp.arange(n, n + u, dtype=jnp.int32),
            jnp.arange(n, dtype=jnp.int32)])
        rbits = _bits_for(u)
        pb = 31 - rbits
        rank = jnp.arange(u, dtype=jnp.uint32)
        w0 = ((rank << jnp.uint32(pb))
              | (tab.sid.astype(jnp.uint32)
                 & jnp.uint32((1 << pb) - 1))).astype(jnp.int32)
        word = jnp.concatenate([w0, jnp.full(n, _NEG1, jnp.int32)])
        return ckh, ckl, val, word

    ckh, ckl, val, word = [jax.device_get(x)
                           for x in prep(tab, codes_p, lengths)]
    # several shuffled variants to defeat any caching
    variants = []
    for i in range(3):
        perm = rng.permutation(m)
        variants.append(tuple(jnp.asarray(x[perm])
                              for x in (ckh, ckl, val, word)))
    jax.block_until_ready(variants)

    timed("prep only", prep, [(tab, codes_p, lengths)])

    sort4 = jax.jit(lambda a, b, c, d: jax.lax.sort(
        (a, b, c, d), num_keys=2, is_stable=True))
    timed("sort alone (real operands)", sort4, variants)

    @jax.jit
    def sort_and_use(a, b, c, d):
        skh, skl, val_s, word_s = jax.lax.sort(
            (a, b, c, d), num_keys=2, is_stable=True)
        return skh[::1000], skl[::1000], val_s[::1000], word_s[::1000]
    timed("sort + strided slice out", sort_and_use, variants)

    @jax.jit
    def sort_scan(a, b, c, d):
        skh, skl, val_s, word_s = jax.lax.sort(
            (a, b, c, d), num_keys=2, is_stable=True)
        iota = jnp.arange(m, dtype=jnp.int32)
        is_table = (skl & jnp.uint32(1)) == 0
        lt = jax.lax.cummax(jnp.where(is_table, iota, _NEG1))
        return lt[::1000]
    timed("sort + one cummax", sort_scan, variants)

    cm = jax.jit(lambda x: jax.lax.cummax(x))
    timed("cummax alone (3.1M i32)", cm, [(v[2],) for v in variants])

    @jax.jit
    def prefix_all(a, b, c, d):
        skh, skl, val_s, word_s = jax.lax.sort(
            (a, b, c, d), num_keys=2, is_stable=True)
        iota = jnp.arange(m, dtype=jnp.int32)
        is_table = (skl & jnp.uint32(1)) == 0
        prev_same = jnp.concatenate([
            jnp.zeros(1, dtype=bool),
            (skh[1:] == skh[:-1]) & ((skl[1:] >> 1) == (skl[:-1] >> 1))])
        lt = jax.lax.cummax(jnp.where(is_table, iota, _NEG1))
        rs = jax.lax.cummax(jnp.where(~prev_same, iota, jnp.int32(0)))
        match = (~is_table) & (lt >= rs)
        cw = jax.lax.cummax(word_s)
        dup = match & prev_same & jnp.concatenate([
            jnp.zeros(1, dtype=bool), ~is_table[:-1]]) & jnp.concatenate([
                jnp.zeros(1, dtype=bool),
                (val_s[1:] // jnp.int32(w)) == (val_s[:-1] // jnp.int32(w))])
        first_occ_s = match & ~dup
        flags = match.astype(jnp.int32) | (first_occ_s.astype(jnp.int32) << 1)
        return val_s[::1000], cw[::1000], flags[::1000]
    timed("sort + full scan block", prefix_all, variants)


if __name__ == "__main__":
    main()
