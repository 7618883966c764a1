"""Differential test: ops/probe_sort2.probe_dedupe_sorted against the
fused hash probe + O(W^2) reference dedupe (pipeline's fallback path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shotgun_tpu.index.build import build_index
from shotgun_tpu.index.hashtable import build_probe_table
from shotgun_tpu.ops.encode import rolling_encode_jnp
from shotgun_tpu.ops.probe import probe_kmers
from shotgun_tpu.ops.probe_sort import SortedTableDev, sorted_table_host
from shotgun_tpu.ops.probe_sort2 import probe_dedupe_sorted
from shotgun_tpu.utils.synth import synth_genomes, synth_reads


@pytest.mark.parametrize(
    "ng,glen,b,l,k", [(3, 2000, 64, 50, 11), (5, 5000, 128, 80, 31), (2, 300, 32, 40, 7)]
)
def test_probe_dedupe_sorted_matches_hash_probe(ng, glen, b, l, k):
    rng = np.random.default_rng(ng * 1000 + k)
    genomes = synth_genomes(rng, ng, glen)
    reads = synth_reads(rng, genomes, b, l)
    # inject within-read duplicate k-mers: tile the read's first k-mer
    codes = np.array(reads.codes)
    codes[::3, : l // 2] = np.tile(
        codes[::3, :k], (1, (l // 2 + k - 1) // k))[:, : l // 2]

    idx = build_index(genomes, k)
    pt = build_probe_table(
        idx.kmer_lo, idx.kmer_hi, idx.set_id, idx.genome_counts(),
        slots_per_bucket=8)
    tab = SortedTableDev(*map(jnp.asarray, sorted_table_host(idx)))
    lo, hi = rolling_encode_jnp(jnp.asarray(codes), k)
    w = l - k + 1
    lens = jnp.asarray(reads.lengths)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    valid = w_iota < (lens - (k - 1))[:, None]
    # random extra gating emulates the MKQ mask
    kq_ok = valid & jnp.asarray(rng.random((b, w)) > 0.1)

    hit2, sid2, gc2, fo2 = jax.jit(
        lambda lo, hi, ok: probe_dedupe_sorted(
            tab, lo, hi, ok,
            num_sets=idx.num_sets, max_genome_count=idx.num_records)
    )(lo, hi, kq_ok)

    hit1, sid1, gc1, sp1 = probe_kmers(
        jnp.asarray(pt.table), jnp.asarray(pt.stash), lo, hi)
    stored = np.asarray(hit1 & kq_ok)
    eq = np.asarray(sp1)[:, :, None] == np.asarray(sp1)[:, None, :]
    prev = np.tril(np.ones((w, w), bool), -1)  # prev[i, j] == j < i
    dup = (eq & stored[:, None, :] & prev[None]).any(axis=2)
    fo1 = stored & ~dup

    assert np.array_equal(np.asarray(hit2), stored)
    assert np.array_equal(np.asarray(sid2)[stored], np.asarray(sid1)[stored])
    assert np.array_equal(np.asarray(gc2)[stored], np.asarray(gc1)[stored])
    assert np.array_equal(np.asarray(fo2), fo1)


def test_wide_payload_no_truncation():
    """sid_bits + gc_bits > 32 must reconstruct exactly (round-1 advisor
    finding: a packed sid|gc<<sid_bits uint32 silently truncated gc)."""
    k = 11
    rng = np.random.default_rng(7)
    genomes = synth_genomes(rng, 3, 800)
    idx = build_index(genomes, k)
    klo, khi, sid, gc = sorted_table_host(idx)
    # forge a large gc on every row and declare a huge set/genome space so
    # sid_bits=20, gc_bits=14 (the advisor's reproduction shape)
    true_gc = 5000
    gc = np.full_like(gc, true_gc)
    tab = SortedTableDev(
        klo=jnp.asarray(klo), khi=jnp.asarray(khi),
        sid=jnp.asarray(sid), gc=jnp.asarray(gc))
    reads = synth_reads(rng, genomes, 8, 40)
    lo, hi = rolling_encode_jnp(jnp.asarray(reads.codes), k)
    ok = jnp.ones(lo.shape, dtype=bool)
    hit, sid_q, gc_q, _ = probe_dedupe_sorted(
        tab, lo, hi, ok, num_sets=2 ** 20, max_genome_count=8192)
    hits = np.asarray(hit)
    assert hits.any()
    assert (np.asarray(gc_q)[hits] == true_gc).all()
    tab_keys = klo.astype(np.uint64) | (khi.astype(np.uint64) << np.uint64(32))
    q_keys = (np.asarray(lo).astype(np.uint64)[hits]
              | (np.asarray(hi).astype(np.uint64)[hits] << np.uint64(32)))
    assert np.array_equal(
        np.asarray(sid_q)[hits], sid[np.searchsorted(tab_keys, q_keys)])
