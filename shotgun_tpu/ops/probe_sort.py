"""Sort-merge k-mer probe: gather-free lookup for TPU.

XLA's dynamic gather on TPU executes as a slow per-row loop, while
``lax.sort`` and cumulative scans are fast bandwidth-bound vector ops
(measured on v5e: 2M-element sort ~3ms vs 1M-row gather ~50ms).  This
probe therefore avoids random access entirely:

  1. concat the table's sorted key array with the batch's window keys,
     tagging queries in the key's least-significant bit (the 62-bit k-mer
     key is shifted left by one, preserving order);
  2. one ``lax.sort``: equal keys group together, table entry first;
  3. cumulative-max scans identify, for every query, whether its run
     contains a table entry, and a fill-forward associative scan carries
     the table payload (set id, genome count) down the run;
  4. a second sort by original position restores batch order.

Cost is O((U + N) log(U + N)) bandwidth-bound work with zero gathers --
the probe of choice when the table is large relative to the batch, and
~17x more memory-efficient than the bucket hash (16B/key vs 268B/key).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SortedTableDev(NamedTuple):
    """Device arrays of the key-sorted k-mer index (k <= 31 2-word form)."""

    klo: jnp.ndarray   # uint32 [U] key low words, sorted by (hi, lo)
    khi: jnp.ndarray   # uint32 [U] key high words
    sid: jnp.ndarray   # int32  [U] genome-set ids
    gc: jnp.ndarray    # int32  [U] genome counts


class SortedTableDevW(NamedTuple):
    """Multi-word form for any k: key words MOST-significant first, each
    [U] uint32, rows sorted by the full lexicographic key (identical to
    the host index's sorted order).  ``gc == 0`` marks pad rows (range-
    partitioning pads; impossible for real entries)."""

    kws: Tuple[jnp.ndarray, ...]
    sid: jnp.ndarray   # int32 [U]
    gc: jnp.ndarray    # int32 [U]


def sorted_table_host_words(index):
    """Host arrays for SortedTableDevW from a KmerIndex: key-word columns
    reversed to most-significant-first."""
    nw = index.kmer_words.shape[1]
    cols = tuple(
        np.ascontiguousarray(index.kmer_words[:, j])
        for j in range(nw - 1, -1, -1)
    )
    return (
        cols,
        index.set_id.astype(np.int32),
        index.genome_counts().astype(np.int32),
    )


def _shift_pack(lo, hi, tag_bit):
    """62-bit key -> order-preserving 64-bit pair with tag in bit 0."""
    skh = (hi << jnp.uint32(1)) | (lo >> jnp.uint32(31))
    skl = (lo << jnp.uint32(1)) | jnp.uint32(tag_bit)
    return skh, skl


def probe_kmers_sorted(
    tab: SortedTableDev,
    lo: jnp.ndarray,   # uint32 [B, W]
    hi: jnp.ndarray,   # uint32 [B, W]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Same contract as ops.probe.probe_kmers: returns
    (hit, set_id, genome_count, slot_pos) as [B, W] arrays."""
    b, w = lo.shape
    n = b * w
    u = int(tab.klo.shape[0])
    if u == 0:
        neg = jnp.full((b, w), -1, dtype=jnp.int32)
        return (jnp.zeros((b, w), dtype=bool), neg,
                jnp.zeros((b, w), dtype=jnp.int32), neg)

    qlo = lo.reshape(-1)
    qhi = hi.reshape(-1)
    tkh, tkl = _shift_pack(tab.klo, tab.khi, 0)
    qkh, qkl = _shift_pack(qlo, qhi, 1)

    m = u + n
    ckh = jnp.concatenate([tkh, qkh])
    ckl = jnp.concatenate([tkl, qkl])
    # queries carry their batch position; table rows sort after all queries
    # in the restore pass
    val = jnp.concatenate([
        jnp.arange(n, n + u, dtype=jnp.int32),
        jnp.arange(n, dtype=jnp.int32),
    ])
    sid_c = jnp.concatenate([tab.sid, jnp.zeros(n, dtype=jnp.int32)])
    gc_c = jnp.concatenate([tab.gc, jnp.zeros(n, dtype=jnp.int32)])

    skh, skl, val_s, sid_s, gc_s = jax.lax.sort(
        (ckh, ckl, val, sid_c, gc_c), num_keys=2
    )

    iota = jnp.arange(m, dtype=jnp.int32)
    is_table = (skl & jnp.uint32(1)) == 0
    # last table entry at or before each position
    lt = jax.lax.cummax(jnp.where(is_table, iota, jnp.int32(-1)))
    # start position of each equal-key run (ignoring the tag bit)
    prev_same = jnp.concatenate([
        jnp.zeros(1, dtype=bool),
        (skh[1:] == skh[:-1]) & ((skl[1:] >> 1) == (skl[:-1] >> 1)),
    ])
    rs = jax.lax.cummax(jnp.where(~prev_same, iota, jnp.int32(0)))
    match = lt >= rs  # a table entry exists inside this run

    # fill the table payload forward through each run
    def ff(a, bb):
        av, a1, a2 = a
        bv, b1, b2 = bb
        return (av | bv, jnp.where(bv, b1, a1), jnp.where(bv, b2, a2))

    _, sid_p, gc_p = jax.lax.associative_scan(ff, (is_table, sid_s, gc_s))

    import os as _os
    if _os.environ.get("SHOTGUN_TPU_SORT2", "packed") == "packed":
        # fold the hit flag into lt's sign (misses -> -1): one fewer operand
        lt_hit = jnp.where(match & ~is_table, lt, jnp.int32(-1))
        _, sid2, gc2, lt2 = jax.lax.sort(
            (val_s, sid_p, gc_p, lt_hit), num_keys=1
        )
        slot_pos = lt2[:n].reshape(b, w)
        hit = slot_pos >= 0
        set_id = jnp.where(hit, sid2[:n].reshape(b, w), jnp.int32(-1))
        genome_count = jnp.where(hit, gc2[:n].reshape(b, w), jnp.int32(0))
        return hit, set_id, genome_count, slot_pos
    hit_s = (match & ~is_table).astype(jnp.int32)
    _, hit2, sid2, gc2, lt2 = jax.lax.sort(
        (val_s, hit_s, sid_p, gc_p, lt), num_keys=1
    )
    hit = hit2[:n].reshape(b, w) > 0
    set_id = jnp.where(hit, sid2[:n].reshape(b, w), jnp.int32(-1))
    genome_count = jnp.where(hit, gc2[:n].reshape(b, w), jnp.int32(0))
    slot_pos = jnp.where(hit, lt2[:n].reshape(b, w), jnp.int32(-1))
    return hit, set_id, genome_count, slot_pos


def sorted_table_host(index) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host arrays for SortedTableDev from a KmerIndex."""
    return (
        index.kmer_lo,
        index.kmer_hi,
        index.set_id.astype(np.int32),
        index.genome_counts().astype(np.int32),
    )
