"""Bucketized open-addressing hash table for device-side k-mer probing.

Replaces the reference's Python dict probe (reference kmer.py:292-298) with
a TPU-friendly layout: the table is a dense uint32 array of shape
[n_buckets, SLOTS, 4] holding (key_lo, key_hi, set_id, genome_count) per
slot.  A probe hashes the packed k-mer to a bucket, gathers the whole
bucket row in one dynamic gather, and compares all SLOTS keys vectorized.
Keys that overflow their bucket spill to the following bucket(s); the
maximum spill distance is recorded at build time and unrolled statically in
the probe, so device control flow stays data-independent.

Exactness: full (lo, hi) keys are compared, never just the hash, so
collisions resolve completely (survey §7.3.4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from shotgun_tpu.ops.encode import mix32

SLOTS = 8
EMPTY = np.uint32(0xFFFFFFFF)


@dataclass
class ProbeTable:
    """Host-resident table arrays, ready to ship to device."""

    table: np.ndarray       # uint32 [n_buckets, SLOTS, 4]
    n_buckets: int          # power of two
    max_bucket_probe: int   # number of consecutive buckets a probe must scan
    num_keys: int

    @property
    def nbytes(self) -> int:
        return self.table.nbytes


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 1).bit_length()


def build_probe_table(
    kmer_lo: np.ndarray,
    kmer_hi: np.ndarray,
    set_id: np.ndarray,
    genome_count: np.ndarray,
    target_load: float = 0.5,
) -> ProbeTable:
    """Place every distinct k-mer into the bucketized table.

    Placement is deterministic: keys are assigned in key-sorted order;
    within a bucket, slots fill in arrival order; overflow walks to the
    next bucket.  With an average bucket occupancy of SLOTS * target_load,
    spills beyond 1-2 buckets are vanishingly rare.
    """
    u = kmer_lo.size
    n_buckets = _next_pow2(max(int(u / (SLOTS * target_load)), 1))
    mask = np.uint32(n_buckets - 1)

    table = np.empty((n_buckets, SLOTS, 4), dtype=np.uint32)
    table[..., 2] = EMPTY  # set_id == EMPTY marks a free slot
    fill = np.zeros(n_buckets, dtype=np.int64)

    bucket = (mix32(kmer_lo, kmer_hi, np) & mask).astype(np.int64)
    pending = np.arange(u, dtype=np.int64)
    max_probe = 0
    while pending.size:
        b = bucket[pending]
        order = np.argsort(b, kind="stable")
        b_sorted = b[order]
        keys_sorted = pending[order]
        # rank of each key within its bucket's contenders this round
        group_start = np.searchsorted(b_sorted, b_sorted)
        rank = np.arange(b_sorted.size, dtype=np.int64) - group_start
        slot = fill[b_sorted] + rank
        placed = slot < SLOTS
        pk, pb, ps = keys_sorted[placed], b_sorted[placed], slot[placed]
        table[pb, ps, 0] = kmer_lo[pk]
        table[pb, ps, 1] = kmer_hi[pk]
        table[pb, ps, 2] = set_id[pk].astype(np.uint32)
        table[pb, ps, 3] = genome_count[pk].astype(np.uint32)
        np.add.at(fill, pb, 1)
        pending = keys_sorted[~placed]
        bucket[pending] = (bucket[pending] + 1) & int(mask)
        max_probe += 1
    return ProbeTable(
        table=table,
        n_buckets=n_buckets,
        max_bucket_probe=max(max_probe, 1),
        num_keys=int(u),
    )
