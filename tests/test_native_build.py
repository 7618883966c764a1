"""Differential tests: native C++ index build vs the numpy assembly.

The native builder (native/kmer_build.cpp) must agree with the pure
numpy path (shotgun_tpu/index/build.py) on every observable field:

* ``kmer_words`` / postings byte-exact;
* ``first_seen`` equal as an ORDER (the native path stores the
  order-isomorphic (rec << 32 | pos) key of the first occurrence instead
  of the global scan rank -- only ``display_order`` is observable);
* set table equal up to set-id permutation (per-k-mer mask bytes and
  sizes identical).
"""

import numpy as np
import pytest

from shotgun_tpu.index import build as B
from shotgun_tpu.io import native
from shotgun_tpu.io.packing import GenomeArrays

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable")


def _numpy_index(genomes, k):
    old = native._lib, native._lib_failed
    native._lib, native._lib_failed = None, True
    try:
        return B.build_index(genomes, k)
    finally:
        native._lib, native._lib_failed = old


def _random_genomes(rng):
    n_rec = int(rng.integers(1, 9))
    max_len = int(rng.integers(30, 3000))
    lens = rng.integers(0, max_len, size=n_rec)
    # codes 0..4: real bases + N (code 4), so N-window skipping is hit
    codes = rng.integers(0, 5, size=int(lens.sum()), dtype=np.uint8)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    return GenomeArrays(
        descriptions=[f"g{i}" for i in range(n_rec)],
        codes=codes, offsets=offsets)


def _assert_equivalent(a, b):
    assert np.array_equal(a.kmer_words, b.kmer_words)
    assert np.array_equal(np.argsort(a.first_seen, kind="stable"),
                          np.argsort(b.first_seen, kind="stable"))
    assert np.array_equal(a.post_offsets, b.post_offsets)
    assert np.array_equal(a.post_record, b.post_record)
    assert np.array_equal(a.post_pos, b.post_pos)
    # set table: compare the per-k-mer mask/size, not the internal ids
    am = [a.set_masks[s].tobytes() for s in a.set_id]
    bm = [b.set_masks[s].tobytes() for s in b.set_id]
    assert am == bm
    assert np.array_equal(a.set_sizes[a.set_id], b.set_sizes[b.set_id])


@pytest.mark.parametrize("seed", range(12))
def test_native_build_matches_numpy(seed):
    rng = np.random.default_rng(1000 + seed)
    genomes = _random_genomes(rng)
    k = int(rng.integers(1, 32))
    a = B.build_index(genomes, k)
    b = _numpy_index(genomes, k)
    _assert_equivalent(a, b)


def test_native_build_used_for_small_k():
    """k <= 31 dispatches to the native builder (fast path actually on)."""
    rng = np.random.default_rng(3)
    genomes = _random_genomes(rng)
    got = native.build_kmer_index(genomes.codes, genomes.offsets, 21)
    assert got is not None


def test_native_build_declines_large_k():
    rng = np.random.default_rng(4)
    genomes = _random_genomes(rng)
    assert native.build_kmer_index(genomes.codes, genomes.offsets, 40) is None


def test_empty_and_short_records():
    """Records shorter than k (incl. empty) produce no windows."""
    g = GenomeArrays(descriptions=["a", "b", "c"],
                     codes=np.array([0, 1, 2], dtype=np.uint8),
                     offsets=np.array([0, 0, 3, 3], dtype=np.int64))
    a = B.build_index(g, 2)
    b = _numpy_index(g, 2)
    _assert_equivalent(a, b)
    assert a.num_kmers == 2  # AC, CG

    # k longer than every record -> empty index
    a = B.build_index(g, 7)
    assert a.num_kmers == 0 and a.post_offsets.tolist() == [0]


def test_all_n_genome():
    g = GenomeArrays(descriptions=["n"],
                     codes=np.full(50, 4, dtype=np.uint8),
                     offsets=np.array([0, 50], dtype=np.int64))
    a = B.build_index(g, 5)
    assert a.num_kmers == 0


def test_multi_chunk_record_with_n_runs():
    """A record longer than the native encoder's 4M-window chunk, with N
    runs straddling chunk boundaries: exercises the parallel chunked
    encode's gap compaction (kmer_build.cpp stage 1), which small inputs
    never reach."""
    rng = np.random.default_rng(11)
    n = 9_000_000  # > 2 encode chunks of 4M windows
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    # N runs: one inside each chunk and one straddling the 4M boundary
    for start, ln in ((1_000_000, 37), (4_194_290, 20), (8_000_000, 3)):
        codes[start:start + ln] = 4
    g = GenomeArrays(descriptions=["big"], codes=codes,
                     offsets=np.array([0, n], dtype=np.int64))
    k = 15
    got = native.build_kmer_index(g.codes, g.offsets, k)
    assert got is not None
    # windows lost to each N run: min(run + k - 1, available) per run
    expect_posts = (n - k + 1) - 3 * (k - 1) - (37 + 20 + 3)
    assert got["post_offsets"][-1] == expect_posts
    # spot-check order + values against a direct slice re-encode around
    # the straddling N run (full numpy differential is too slow here)
    pos = got["post_pos"]
    # within each k-mer group, postings keep scan order (ascending pos;
    # single record), which is what the sorted join's dedupe relies on
    off = got["post_offsets"]
    interior = np.ones(pos.size, dtype=bool)
    interior[off[:-1]] = False  # first posting of each group
    assert bool(np.all(np.diff(pos)[interior[1:]] > 0))
    lo, hi = 4_194_290, 4_194_290 + 20
    in_gap = (pos > lo - k) & (pos < hi)
    assert not bool(np.any(in_gap))
