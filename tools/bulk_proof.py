#!/usr/bin/env python3
"""Bulk-scale proof on the real chip (VERDICT r3 #6 and #8).

Part A (k=31): 100 Mbp DB (~100M distinct k-mers, 1.6 GB sorted table),
1M+ reads aligned through the production stream path; HBM footprint,
build time, align throughput; output verified against the host
pseudo_align spec on a sampled subset.

Part B (k=75): ~16M-key multi-word (5-word) table exercised through the
words-table SHARDED probe on a 1-device 'table' axis -- validates the
sharded kernel's memory behavior and merge at size on real hardware.

Usage: python tools/bulk_proof.py [a|b|ab]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from shotgun_tpu.aligner import PseudoAlignment, Read
from shotgun_tpu.index.build import build_index
from shotgun_tpu.io.data_file import open_fastq_stream
from shotgun_tpu.io.records import SeqRecord
from shotgun_tpu.reference import KmerReference
from shotgun_tpu.utils.synth import synth_genomes, synth_reads, to_fastq


def log(m):
    print(m, flush=True)


def part_a():
    K, L, N_READS = 31, 150, 1_048_576
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    genomes = synth_genomes(rng, 16, 6_250_000)  # 100 Mbp
    log(f"A: synth 100 Mbp genomes: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    idx = build_index(genomes, K)
    log(f"A: host native build: {time.perf_counter() - t0:.1f}s "
        f"({100 / (time.perf_counter() - t0):.1f} Mbp/s, "
        f"{idx.num_kmers:,} kmers, {idx.num_sets} sets)")

    ref = KmerReference(K, _index=idx)
    t0 = time.perf_counter()
    tab = ref.device_probe_tables("sort")
    nbytes = sum(a.nbytes for a in jax.tree.leaves(tab))
    log(f"A: device table: {nbytes / 1e9:.2f} GB "
        f"({int(tab.klo.shape[0]):,} padded rows), "
        f"upload+prep {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    reads = synth_reads(rng, genomes, N_READS, L)
    fq = os.path.join(tempfile.mkdtemp(), "bulk.fq")
    with open(fq, "wb") as f:
        f.write(to_fastq(reads).encode())
    log(f"A: synth+serialize {N_READS:,} reads: "
        f"{time.perf_counter() - t0:.1f}s")

    # compile warm, then timed
    for label in ("warm", "timed"):
        t0 = time.perf_counter()
        pa = PseudoAlignment(ref)
        pa.align_stream(open_fastq_stream(fq, lazy=True), 1, 1,
                        batch_size=16384)
        summary = pa.get_summary()
        dt = time.perf_counter() - t0
        log(f"A: stream align ({label}): {dt:.2f}s = "
            f"{N_READS / dt:,.0f} reads/s  "
            f"stats={summary['Statistics']}")

    # verify a sampled subset against the host pseudo_align spec
    t0 = time.perf_counter()
    sample = rng.choice(N_READS, size=64, replace=False)
    mism = 0
    id_of = {}
    for rid, code in zip(pa._read_ids, pa._mtypes):
        id_of[rid] = code
    # device path stored no per-read results (store_reads=False); re-run
    # the sampled reads through the batched path WITH storage instead
    from shotgun_tpu.io.packing import pack_reads

    recs = []
    for i in sample:
        s = reads.codes[i, :reads.lengths[i]]
        seq = "".join("ACGT"[c] for c in s)
        q = reads.qual[i, :reads.lengths[i]].tobytes().decode("ascii")
        recs.append(SeqRecord([("identifier", f"s{i}"), ("sequence", seq),
                               ("space", ""), ("quality_sequence", q)]))
    pa2 = PseudoAlignment(ref)
    pa2.align_packed_reads(pack_reads(recs), 1, 1, store_reads=True)
    for r, rec in zip(sample, recs):
        host_read = Read(rec)
        host_read.pseudo_align(ref, 1, 1)
        got = pa2._mtypes[list(pa2._read_ids).index(f"s{r}")]
        want = {"UNMAPPED": 0, "UNIQUELY_MAPPED": 1,
                "AMBIGUOUSLY_MAPPED": 2}[host_read.mapping.type.name]
        mism += got != want
    log(f"A: sampled host-spec check: {64 - mism}/64 match "
        f"({time.perf_counter() - t0:.1f}s)")
    assert mism == 0


def part_b():
    K, L, B = 75, 150, 4096
    rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    genomes = synth_genomes(rng, 4, 4_200_000)  # ~16.8 Mbp -> ~16.8M keys
    idx = build_index(genomes, K)
    log(f"B: k={K} build: {time.perf_counter() - t0:.1f}s "
        f"({idx.num_kmers:,} kmers, {idx.kmer_words.shape[1]} words/key)")
    assert idx.num_kmers >= 16_000_000

    ref = KmerReference(K, _index=idx)
    reads = synth_reads(rng, genomes, B, L)

    from shotgun_tpu.ops.probe_sort import sorted_table_host_words
    from shotgun_tpu.parallel.table_sharded import (
        align_aggregate_table_sharded,
        device_put_sharded_table,
        make_mesh_2d,
        pad_table_words_for_sharding,
    )

    mesh = make_mesh_2d(jax.devices()[:1], data=1, table=1)
    tab = pad_table_words_for_sharding(
        sorted_table_host_words(idx), 1)
    t0 = time.perf_counter()
    tab_d = device_put_sharded_table(mesh, tab)
    nbytes = sum(a.nbytes for a in jax.tree.leaves(tab_d))
    log(f"B: sharded words table on device: {nbytes / 1e9:.2f} GB, "
        f"upload {time.perf_counter() - t0:.1f}s")

    member = ref.set_member_dense()
    lpad = ((L + 31) // 32) * 32
    codes = np.zeros((B, lpad), dtype=np.uint8)
    codes[:, :L] = reads.codes
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    member_d = jax.device_put(member, rep)
    codes_d = jax.device_put(codes, NamedSharding(mesh, P("data")))
    qual_d = jax.device_put(np.zeros((B, 1), np.uint8), rep)
    len_d = jax.device_put(reads.lengths, NamedSharding(mesh, P("data")))
    rv_d = jax.device_put(np.ones(B, bool), NamedSharding(mesh, P("data")))
    one, z = jnp.int32(1), jnp.int32(0)

    t0 = time.perf_counter()
    agg = align_aggregate_table_sharded(
        tab_d, member_d, codes_d, qual_d, len_d, rv_d,
        one, one, z, z, z, mesh=mesh, k=K,
        has_mrq=False, has_mkq=False, has_mg=False)
    got = jax.device_get(agg)
    log(f"B: sharded probe compile+run: {time.perf_counter() - t0:.1f}s  "
        f"unique={int(got.n_unique)} amb={int(got.n_ambiguous)} "
        f"unmapped={int(got.n_unmapped)}")

    # equality vs the single-device unsharded program
    from shotgun_tpu.models.pipeline import align_batch

    tab_rep = ref.device_probe_tables("sort")
    _res, agg2 = align_batch(
        tab_rep, jnp.asarray(member), jnp.asarray(codes),
        jnp.asarray(np.zeros((B, 1), np.uint8)),
        jnp.asarray(reads.lengths), jnp.asarray(np.ones(B, bool)),
        one, one, z, z, z, k=K,
        has_mrq=False, has_mkq=False, has_mg=False, with_aggregate=True)
    got2 = jax.device_get(agg2)
    assert int(got.n_unique) == int(got2.n_unique)
    assert int(got.n_ambiguous) == int(got2.n_ambiguous)
    assert int(got.n_unmapped) == int(got2.n_unmapped)
    assert np.array_equal(np.asarray(got.unique_by_rec),
                          np.asarray(got2.unique_by_rec))
    log("B: sharded == unsharded aggregation (counters + per-record)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ab"
    if "a" in which:
        part_a()
    if "b" in which:
        part_b()
    log("bulk proof done")
