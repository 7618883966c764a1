"""Sort-merge k-mer probe v2: gather-free lookup + in-sort dedupe.

Replaces ops/probe_sort.py's associative_scan payload fill (which compiles
an enormous HLO) with plain ``cummax`` carries, and folds the per-read
first-occurrence dedupe (reference kmer.py:429) into the sorted domain so
the pipeline's O(W^2) dedupe block disappears.

The probe is one ``lax.sort`` join:

  1. tag-pack table keys (bit 0 = 0) and query keys (bit 0 = 1); queries
     that failed the MKQ/validity gates get an all-ones sentinel key so
     they can never match;
  2. one stable 2-key sort groups equal keys, table row first, queries in
     original (read, window) order;
  3. ``cummax`` scans recover, per query, whether its run contains a table
     row and that row's payload: each table row carries
     ``(rank << Pb) | payload_chunk`` words -- the cummax over sorted
     order always selects the latest table row, whose low bits are the
     payload chunk (rank is monotone in sorted position because the table
     is pre-sorted by key);
  4. a query is a within-read duplicate iff its sorted predecessor is a
     query with the same key from the same read (stable order makes
     same-read same-key queries consecutive);
  5. one restore sort by original position brings (hit, set id, genome
     count, first-occurrence) back to [B, W].

Zero gathers, zero scatters: sorts + cumulative maxima + elementwise only.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shotgun_tpu.ops.probe_sort import (  # noqa: F401 (re-export)
    SortedTableDev,
    SortedTableDevW,
    sorted_table_host,
    sorted_table_host_words,
)

_NEG1 = np.int32(-1)


def _bits_for(n: int) -> int:
    """ceil(log2(max(n, 2))) -- bits to represent values in [0, n)."""
    return max(int(np.ceil(np.log2(max(int(n), 2)))), 1)


def _shift_pack(lo, hi, tag_bit: int):
    """62-bit key -> order-preserving 64-bit pair with tag in bit 0."""
    skh = (hi << jnp.uint32(1)) | (lo >> jnp.uint32(31))
    skl = (lo << jnp.uint32(1)) | jnp.uint32(tag_bit)
    return skh, skl


def probe_dedupe_sorted(
    tab: SortedTableDev,
    lo: jnp.ndarray,      # uint32 [B, W]
    hi: jnp.ndarray,      # uint32 [B, W]
    query_ok: jnp.ndarray,  # bool [B, W] windows that passed validity + MKQ
    *,
    num_sets: int,
    max_genome_count: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Probe + within-read first-occurrence dedupe in one sorted join.

    Returns (hit, set_id, genome_count, first_occ), all [B, W]:
    ``hit`` is True iff the window passed ``query_ok`` and its k-mer is in
    the table; ``first_occ`` marks the first hit window of each distinct
    k-mer within its read (reference kmer.py:429).  Misses have
    set_id == -1, genome_count == 0.

    ``num_sets``/``max_genome_count`` bound the payload values (static) so
    the carry words can be sized; genome counts saturate at 2**16-1 when
    larger (the count is only compared against mg and == 1).
    """
    b, w = lo.shape
    n = b * w
    u = int(tab.klo.shape[0])
    if u == 0:
        neg = jnp.full((b, w), -1, dtype=jnp.int32)
        zero = jnp.zeros((b, w), dtype=jnp.int32)
        false = jnp.zeros((b, w), dtype=bool)
        return false, neg, zero, false
    m = u + n

    # ---- payload sizing (static) ----
    # sid and gc travel as independent chunk streams (each value is
    # reconstructed into its own uint32), so any (num_sets,
    # max_genome_count) combination is exact -- a single packed
    # sid|gc<<sid_bits word would silently truncate past 32 bits
    rbits = _bits_for(u)
    pb = 31 - rbits
    assert pb >= 1, "table too large for int32 carry words"
    sid_bits = _bits_for(num_sets)
    gc_cap = min(int(max_genome_count), (1 << 16) - 1)
    gc_bits = _bits_for(gc_cap + 1)
    sid_words = -(-sid_bits // pb)
    gc_words = -(-gc_bits // pb)
    n_words = sid_words + gc_words

    # ---- build sort operands ----
    qlo = lo.reshape(-1)
    qhi = hi.reshape(-1)
    ok = query_ok.reshape(-1)
    qkh, qkl = _shift_pack(qlo, qhi, 1)
    # gated-out queries get the max key (can't match; table keys have tag 0)
    ones = jnp.uint32(0xFFFFFFFF)
    qkh = jnp.where(ok, qkh, ones)
    qkl = jnp.where(ok, qkl, ones)
    tkh, tkl = _shift_pack(tab.klo, tab.khi, 0)

    ckh = jnp.concatenate([tkh, qkh])
    ckl = jnp.concatenate([tkl, qkl])
    val = jnp.concatenate([
        jnp.arange(n, n + u, dtype=jnp.int32),   # table rows restore last
        jnp.arange(n, dtype=jnp.int32),
    ])

    # carry words: (rank << pb) | chunk for table rows, -1 for queries
    gc_c = jnp.minimum(tab.gc, jnp.int32(gc_cap)).astype(jnp.uint32)
    sid_u = tab.sid.astype(jnp.uint32)
    rank = jnp.arange(u, dtype=jnp.uint32)
    words = []
    mask_pb = jnp.uint32((1 << pb) - 1)
    for j in range(n_words):
        if j < sid_words:
            chunk = (sid_u >> jnp.uint32(j * pb)) & mask_pb
        else:
            chunk = (gc_c >> jnp.uint32((j - sid_words) * pb)) & mask_pb
        wj = ((rank << jnp.uint32(pb)) | chunk).astype(jnp.int32)
        words.append(jnp.concatenate([wj, jnp.full(n, _NEG1, jnp.int32)]))

    ops = jax.lax.sort((ckh, ckl, val, *words), num_keys=2, is_stable=True)
    skh, skl, val_s = ops[0], ops[1], ops[2]
    words_s = ops[3:]

    # ---- sorted-domain logic (scans + elementwise) ----
    iota = jnp.arange(m, dtype=jnp.int32)
    is_table = (skl & jnp.uint32(1)) == 0
    prev_same = jnp.concatenate([
        jnp.zeros(1, dtype=bool),
        (skh[1:] == skh[:-1]) & ((skl[1:] >> 1) == (skl[:-1] >> 1)),
    ])
    lt = jax.lax.cummax(jnp.where(is_table, iota, _NEG1))
    rs = jax.lax.cummax(jnp.where(~prev_same, iota, jnp.int32(0)))
    match = (~is_table) & (lt >= rs)

    # payload chunks from the latest table row (exactly the run's row when
    # match holds: rank is monotone in sorted position)
    sid_acc = jnp.zeros(m, dtype=jnp.uint32)
    gc_acc = jnp.zeros(m, dtype=jnp.uint32)
    for j in range(n_words):
        cw = jax.lax.cummax(words_s[j])
        chunk = cw.astype(jnp.uint32) & mask_pb
        if j < sid_words:
            sid_acc = sid_acc | (chunk << jnp.uint32(j * pb))
        else:
            gc_acc = gc_acc | (chunk << jnp.uint32((j - sid_words) * pb))
    sid_q = sid_acc.astype(jnp.int32)
    gc_q = gc_acc.astype(jnp.int32)

    # within-read duplicate: predecessor is a same-key query from the same
    # read (stable sort keeps same-key queries in read/window order)
    prev_is_query = jnp.concatenate([
        jnp.zeros(1, dtype=bool), ~is_table[:-1]])
    same_read = jnp.concatenate([
        jnp.zeros(1, dtype=bool),
        (val_s[1:] // jnp.int32(w)) == (val_s[:-1] // jnp.int32(w)),
    ])
    dup = match & prev_same & prev_is_query & same_read
    first_occ_s = match & ~dup

    # ---- restore original order ----
    flags = (match.astype(jnp.int32)
             | (first_occ_s.astype(jnp.int32) << 1))
    _, sid_r, gc_r, flags_r = jax.lax.sort(
        (val_s, sid_q, gc_q, flags), num_keys=1, is_stable=True)
    hit = (flags_r[:n] & 1).astype(bool).reshape(b, w)
    first_occ = (flags_r[:n] >> 1).astype(bool).reshape(b, w)
    set_id = jnp.where(hit, sid_r[:n].reshape(b, w), _NEG1)
    genome_count = jnp.where(hit, gc_r[:n].reshape(b, w), jnp.int32(0))
    return hit, set_id, genome_count, first_occ


def probe_dedupe_sorted_words(
    tab: SortedTableDevW,
    qws: Tuple[jnp.ndarray, ...],  # query key words, msb first, each [B, W]
    query_ok: jnp.ndarray,         # bool [B, W] windows passing validity+MKQ
    *,
    num_sets: int,
    max_genome_count: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-word-key form of ``probe_dedupe_sorted`` (any k).

    Same contract: probe + within-read first-occurrence dedupe in one
    sorted join, returning (hit, set_id, genome_count, first_occ) [B, W].

    Instead of folding a tag bit into the key (which needs a free bit the
    multi-word key may not have, e.g. 2k == 32*nw), rows carry a separate
    uint32 tag sort word AFTER the key words:

      0 = real table row,  1 = ok query,  2 = gated query,  3 = table pad

    Runs are equal-key groups irrespective of tag; within a run the tag
    orders real table rows first, then ok queries (stable: original read/
    window order), then gated queries and pads -- so the ok-query dup
    chain is contiguous, gated windows never match or claim first_occ,
    and a pad row can never shadow a real entry even when its all-ones
    key equals a real poly-T k-mer (possible when 2k == 32*nw).
    """
    b, w = qws[0].shape
    n = b * w
    nw = len(qws)
    u = int(tab.kws[0].shape[0])
    if u == 0:
        neg = jnp.full((b, w), -1, dtype=jnp.int32)
        zero = jnp.zeros((b, w), dtype=jnp.int32)
        false = jnp.zeros((b, w), dtype=bool)
        return false, neg, zero, false
    m = u + n

    # ---- payload sizing (static; see probe_dedupe_sorted) ----
    rbits = _bits_for(u)
    pb = 31 - rbits
    assert pb >= 1, "table too large for int32 carry words"
    sid_bits = _bits_for(num_sets)
    gc_cap = min(int(max_genome_count), (1 << 16) - 1)
    gc_bits = _bits_for(gc_cap + 1)
    sid_words = -(-sid_bits // pb)
    gc_words = -(-gc_bits // pb)
    n_words = sid_words + gc_words

    # ---- sort operands: nw key words + tag word, then value + payload ----
    ok = query_ok.reshape(-1)
    is_pad = tab.gc <= 0
    keys = [
        jnp.concatenate([tw, qw.reshape(-1)]) for tw, qw in zip(tab.kws, qws)
    ]
    tag = jnp.concatenate([
        jnp.where(is_pad, jnp.uint32(3), jnp.uint32(0)),
        jnp.where(ok, jnp.uint32(1), jnp.uint32(2)),
    ])
    val = jnp.concatenate([
        jnp.arange(n, n + u, dtype=jnp.int32),   # table rows restore last
        jnp.arange(n, dtype=jnp.int32),
    ])

    gc_c = jnp.clip(tab.gc, 0, jnp.int32(gc_cap)).astype(jnp.uint32)
    sid_u = tab.sid.astype(jnp.uint32)
    rank = jnp.arange(u, dtype=jnp.uint32)
    words = []
    mask_pb = jnp.uint32((1 << pb) - 1)
    for j in range(n_words):
        if j < sid_words:
            chunk = (sid_u >> jnp.uint32(j * pb)) & mask_pb
        else:
            chunk = (gc_c >> jnp.uint32((j - sid_words) * pb)) & mask_pb
        wj = ((rank << jnp.uint32(pb)) | chunk).astype(jnp.int32)
        wj = jnp.where(is_pad, _NEG1, wj)  # pads carry no payload
        words.append(jnp.concatenate([wj, jnp.full(n, _NEG1, jnp.int32)]))

    ops = jax.lax.sort(
        (*keys, tag, val, *words), num_keys=nw + 1, is_stable=True)
    keys_s = ops[:nw]
    tag_s = ops[nw]
    val_s = ops[nw + 1]
    words_s = ops[nw + 2:]

    # ---- sorted-domain logic ----
    iota = jnp.arange(m, dtype=jnp.int32)
    is_table = tag_s == jnp.uint32(0)
    is_okq = tag_s == jnp.uint32(1)
    prev_same = jnp.ones(m - 1, dtype=bool)
    for ks in keys_s:
        prev_same = prev_same & (ks[1:] == ks[:-1])
    prev_same = jnp.concatenate([jnp.zeros(1, dtype=bool), prev_same])
    lt = jax.lax.cummax(jnp.where(is_table, iota, _NEG1))
    rs = jax.lax.cummax(jnp.where(~prev_same, iota, jnp.int32(0)))
    match = is_okq & (lt >= rs)

    sid_acc = jnp.zeros(m, dtype=jnp.uint32)
    gc_acc = jnp.zeros(m, dtype=jnp.uint32)
    for j in range(n_words):
        cw = jax.lax.cummax(words_s[j])
        chunk = cw.astype(jnp.uint32) & mask_pb
        if j < sid_words:
            sid_acc = sid_acc | (chunk << jnp.uint32(j * pb))
        else:
            gc_acc = gc_acc | (chunk << jnp.uint32((j - sid_words) * pb))
    sid_q = sid_acc.astype(jnp.int32)
    gc_q = gc_acc.astype(jnp.int32)

    # within-read duplicate: predecessor is a same-key OK query from the
    # same read (ok queries are tag-contiguous and stable-ordered)
    prev_is_okq = jnp.concatenate([jnp.zeros(1, dtype=bool), is_okq[:-1]])
    same_read = jnp.concatenate([
        jnp.zeros(1, dtype=bool),
        (val_s[1:] // jnp.int32(w)) == (val_s[:-1] // jnp.int32(w)),
    ])
    dup = match & prev_same & prev_is_okq & same_read
    first_occ_s = match & ~dup

    # ---- restore original order ----
    flags = (match.astype(jnp.int32)
             | (first_occ_s.astype(jnp.int32) << 1))
    _, sid_r, gc_r, flags_r = jax.lax.sort(
        (val_s, sid_q, gc_q, flags), num_keys=1, is_stable=True)
    hit = (flags_r[:n] & 1).astype(bool).reshape(b, w)
    first_occ = (flags_r[:n] >> 1).astype(bool).reshape(b, w)
    set_id = jnp.where(hit, sid_r[:n].reshape(b, w), _NEG1)
    genome_count = jnp.where(hit, gc_r[:n].reshape(b, w), jnp.int32(0))
    return hit, set_id, genome_count, first_occ
