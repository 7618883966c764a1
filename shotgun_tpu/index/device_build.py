"""Device-side k-mer index build: the TPU replaces the host build loop.

The reference builds its DB with a Python dict scan at 0.05 Mbp/s
(reference kmer.py:135-150); the native C++ builder reaches ~18 Mbp/s on
the 2 host cores.  This module builds the ALIGN-relevant index -- the
sorted probe table (keys, set ids, genome counts) and the genome-set
table -- entirely on the TPU with the same sort machinery the probe path
uses, so the "build DB then align" dumpalign flow never materializes
host postings at all.  The big arrays stay device-resident and feed
``ops.probe_sort2`` directly; only the tiny set table and two scalars
are fetched.

Passes (all jit, static shapes, shape-bucketed -- see
``reference.KmerReference._pad_rows``):

  1. windows: rolling 2-bit encode over the concatenated genome codes;
     windows containing an N or crossing a record boundary get an
     all-ones sentinel key (unreachable by real 62-bit keys).
  2. one stable 2-key sort of (key_hi, key_lo) carrying the window's
     record id and global scan index -- groups duplicate k-mers with
     scan order preserved inside each group.
  3. boundary scan: ``new`` flags, group ids, and ONE segmented
     associative scan that ORs per-record bitmask words and carries the
     group's first-seen index; each group's LAST row ends up holding the
     full genome-set mask and first-seen.
  4. compaction sort: key ``gid`` for group-last rows / BIG otherwise
     brings the [U] distinct rows to the front in key order; a second
     jit specialized on the U shape bucket slices and pads.
  5. set dedupe: sort the [U_pad] masks, boundary-scan set ids, popcount
     genome counts; restore to key order.  Zero gathers anywhere.

Limits: k <= 31 (two-word keys) and R <= 64 records (the mask rides in
two uint32 scan words).  Anything else falls back to the host builder.
Correctness is pinned by equality tests against the host index
(tests/test_device_build.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

from shotgun_tpu.utils.platform import configure_platform

configure_platform()

import jax
import jax.numpy as jnp

_ONES = np.uint32(0xFFFFFFFF)
_BIG = np.int32(0x7FFFFFFF)


class DeviceBuildOut(NamedTuple):
    """Compacted build products (device-resident, window-shaped)."""

    num_kmers: jnp.ndarray   # int32 [] distinct valid k-mers
    klo: jnp.ndarray         # uint32 [W] distinct keys first, then junk
    khi: jnp.ndarray         # uint32 [W]
    mask_lo: jnp.ndarray     # uint32 [W] genome-set mask bits 0..31
    mask_hi: jnp.ndarray     # uint32 [W] bits 32..63
    first_seen: jnp.ndarray  # int32 [W] global scan index of first occ


def _segmented_or_scan(new, vals):
    """Inclusive segmented OR scan: segments start where ``new`` is True;
    vals[j][i] becomes the OR of its segment's elements up to i.

    Classic flag-carrying doubling: at distance d, an element absorbs its
    d-left neighbor unless a segment head sits at or before the gap, and
    head flags propagate the same way.  O(log n) steps of shifts + ORs --
    each step is constant HLO, so compile time is flat in n (unlike
    jax.lax.associative_scan on TPU)."""
    n = int(new.shape[0])
    flag = new
    vals = tuple(vals)
    d = 1
    while d < n:
        def sh(x, fill):
            return jnp.concatenate(
                [jnp.full(d, fill, x.dtype), x[:-d]])
        shifted = tuple(sh(v, 0) for v in vals)
        vals = tuple(
            jnp.where(flag, v, v | sv) for v, sv in zip(vals, shifted))
        flag = flag | sh(flag, True)
        d *= 2
    return vals


def _build_sorted_core(codes2: jnp.ndarray,    # uint8 [Gp/4] 2-bit packed
                       nmask: jnp.ndarray,     # uint8 [Gp/8] N/pad bitmask
                       rec_start: jnp.ndarray,  # int32 [Gp] record starts
                       *, k: int) -> DeviceBuildOut:
    """Passes 1-4: windows -> sorted groups -> compacted distinct rows.

    Genomes arrive 2-bit packed plus an N/pad bitmask (0.375 B/base
    upload vs 1 B/base -- the tunnel upload capped the build rate); N
    positions carry garbage 2-bit codes that the validity mask excludes,
    exactly like the read path's packed plane."""
    g = int(codes2.shape[0]) * 4
    w = g - k + 1

    # device-side unpack (same layout as ops.encode.unpack_codes_2bit)
    u = codes2.astype(jnp.uint32)[:, None]
    shifts = jnp.arange(4, dtype=jnp.uint32)[None, :] * jnp.uint32(2)
    c32 = ((u >> shifts) & jnp.uint32(3)).reshape(g)
    nb = nmask.astype(jnp.uint32)[:, None]
    bshifts = jnp.arange(8, dtype=jnp.uint32)[None, :]
    bad = ((nb >> bshifts) & jnp.uint32(1)).astype(jnp.int32).reshape(g)

    lo = jnp.zeros(w, dtype=jnp.uint32)
    hi = jnp.zeros(w, dtype=jnp.uint32)
    for j in range(k):
        c = c32[j: j + w]
        hi = (hi << jnp.uint32(2)) | (lo >> jnp.uint32(30))
        lo = (lo << jnp.uint32(2)) | c
    # validity: no N/pad byte inside the window, no record start strictly
    # inside it (a window belongs to the record its first base is in)
    cs_bad = jnp.cumsum(bad)
    bad_in = cs_bad[k - 1:] - jnp.concatenate(
        [jnp.zeros(1, jnp.int32), cs_bad[: w - 1]])
    cs_rs = jnp.cumsum(rec_start)
    starts_in = cs_rs[k - 1:] - cs_rs[: w]
    valid = (bad_in == 0) & (starts_in == 0)
    rec_of_win = (cs_rs[: w] - 1).astype(jnp.int32)  # record of first base

    skh = jnp.where(valid, hi, jnp.uint32(_ONES))
    skl = jnp.where(valid, lo, jnp.uint32(_ONES))
    iota_w = jnp.arange(w, dtype=jnp.int32)

    skh, skl, idx_s, rec_s = jax.lax.sort(
        (skh, skl, iota_w, rec_of_win), num_keys=2, is_stable=True)

    # group boundaries (invalid windows share the all-ones key: one junk
    # group at the very end, excluded via the key's MSB -- real keys
    # have hi < 2**30)
    live = (skh >> jnp.uint32(31)) == 0
    prev_same = jnp.concatenate([
        jnp.zeros(1, dtype=bool),
        (skh[1:] == skh[:-1]) & (skl[1:] == skl[:-1])])
    new = live & ~prev_same
    gid = jnp.cumsum(new.astype(jnp.int32)) - 1
    num_kmers = jnp.sum(new.astype(jnp.int32))

    # genome-set mask words + first-seen, one segmented OR scan: only a
    # group's start row contributes its first-seen (0 elsewhere), every
    # row contributes its record bit, and the scan resets at starts --
    # the group's LAST row holds the full OR.  Hand-rolled log-step
    # doubling (Hillis-Steele with segment flags) instead of
    # jax.lax.associative_scan, whose XLA compile time explodes with
    # array size on TPU (measured: 67 s at 2^20 rows, >300 s at 2^23;
    # this form compiles flat).
    bit = (rec_s & jnp.int32(31)).astype(jnp.uint32)
    m_lo = jnp.where(rec_s < 32, jnp.uint32(1) << bit, jnp.uint32(0))
    m_hi = jnp.where(rec_s >= 32, jnp.uint32(1) << bit, jnp.uint32(0))
    fs_w = jnp.where(new, idx_s, 0).astype(jnp.uint32)

    or_lo, or_hi, fs_or = _segmented_or_scan(new, (m_lo, m_hi, fs_w))
    is_last = jnp.concatenate([~prev_same[1:], jnp.ones(1, dtype=bool)])
    last = live & is_last

    # compaction: group-last rows to the front in gid (= key) order
    ckey = jnp.where(last, gid, _BIG)
    _, klo_c, khi_c, mlo_c, mhi_c, fs_c = jax.lax.sort(
        (ckey, skl, skh, or_lo, or_hi, fs_or.astype(jnp.int32)),
        num_keys=1, is_stable=False)
    return DeviceBuildOut(
        num_kmers=num_kmers,
        klo=klo_c, khi=khi_c,
        mask_lo=mlo_c, mask_hi=mhi_c,
        first_seen=fs_c,
    )


def _finish_table_core(out: DeviceBuildOut, *, u_pad: int):
    """Pass 5 at the static shape bucket: slice/pad to [u_pad], dedupe the
    genome-set masks into (set_id, mask table in set-id order), compute
    genome counts.  Returns arrays shaped exactly like the padded
    ``SortedTableDev``."""
    u = out.num_kmers
    n = out.klo.shape[0]
    iota = jnp.arange(u_pad, dtype=jnp.int32)
    in_range = iota < u

    def take(x, fill):
        if u_pad <= n:
            sl = x[:u_pad]
        else:
            sl = jnp.concatenate([
                x, jnp.full(u_pad - n, fill, dtype=x.dtype)])
        return jnp.where(in_range, sl, fill)

    klo = take(out.klo, jnp.uint32(_ONES))
    khi = take(out.khi, jnp.uint32(_ONES))
    mlo = take(out.mask_lo, jnp.uint32(0))
    mhi = take(out.mask_hi, jnp.uint32(0))
    fs = take(out.first_seen, _BIG)

    # dedupe masks: sort (mhi, mlo) with row ids; every real k-mer has a
    # nonzero mask, so pads (0, 0) sort first and are excluded cleanly
    smhi, smlo, rows = jax.lax.sort((mhi, mlo, iota), num_keys=2,
                                    is_stable=True)
    live_s = (smhi | smlo) != 0
    prev_same = jnp.concatenate([
        jnp.zeros(1, dtype=bool),
        (smhi[1:] == smhi[:-1]) & (smlo[1:] == smlo[:-1])])
    new_set = live_s & ~prev_same
    sid_sorted = jnp.cumsum(new_set.astype(jnp.int32)) - 1
    num_sets = jnp.sum(new_set.astype(jnp.int32))
    # restore set ids to key order (rows is a permutation: 1-key sort)
    _, sid = jax.lax.sort((rows, sid_sorted), num_keys=1, is_stable=False)
    sid = jnp.where(in_range, sid, 0)

    gc_all = (jax.lax.population_count(mlo)
              + jax.lax.population_count(mhi)).astype(jnp.int32)

    # set table in set-id order: run starts to the front
    skey = jnp.where(new_set, sid_sorted, _BIG)
    _, set_mlo, set_mhi = jax.lax.sort((skey, smlo, smhi), num_keys=1,
                                       is_stable=False)
    return (klo, khi, sid, gc_all, fs, num_sets, set_mlo, set_mhi)


#: set-table fetch width: more distinct genome-sets than this falls back
#: to the host builder (the dense [S, R] member matrix would be the
#: bottleneck there anyway)
SMAX = 4096


@functools.partial(jax.jit, static_argnames=("k", "u_pad"))
def _build_tables(codes, nmask, offsets, *, k: int, u_pad: int):
    """Single-dispatch build: passes 1-5 fused.  ``u_pad`` is sized from
    the window count (>= the distinct-k-mer count by construction), so no
    mid-pipeline scalar fetch is needed -- on the tunneled runtime every
    fetch is a full RPC round trip and dominated the two-dispatch form.

    ``offsets``: int32 [65] record-start positions (padded by repeating
    the end-of-genomes position, which lands in the N-sentinel pad region
    where every window is invalid anyway) -- the [Gp] record-start plane
    builds on device, because shipping it as int32 was 4 B/base of
    upload and capped the build at ~13 Mbp/s over the tunnel."""
    rec_start = jnp.zeros(codes.shape[0] * 4, jnp.int32).at[offsets].set(1)
    out = _build_sorted_core(codes, nmask, rec_start, k=k)
    klo, khi, sid, gc, fs, num_sets, set_mlo, set_mhi = _finish_table_core(
        out, u_pad=u_pad)
    return (klo, khi, sid, gc, fs, out.num_kmers, num_sets,
            set_mlo[:SMAX], set_mhi[:SMAX])


def device_build_tables(genomes, k: int, pad_rows) -> Optional[dict]:
    """Build the padded sorted probe table + set table on device.

    ``genomes``: io.packing.GenomeArrays; ``pad_rows``: the shape-bucket
    function (reference.KmerReference._pad_rows).  Returns a dict with
    device arrays {klo, khi, sid, gc} (shaped [U_pad] per the bucket),
    host set_masks (uint8 [S, 8]), first_seen (device [U_pad]), and ints
    num_kmers/num_sets -- or None when unsupported (k > 31, R > 64,
    genomes shorter than k, or more than SMAX distinct genome-sets).

    One upload, one dispatch, one fetch: ``u_pad`` is bucketed from the
    window count rather than the true distinct count (equal buckets for
    low-redundancy genomes; repetitive genomes carry dead pad rows, which
    the probe skips by contract).
    """
    if k > 31 or genomes.num_records > 64 or genomes.codes.size < k:
        return None
    g = int(genomes.codes.size)
    # at least one N-sentinel pad byte even at k == 1, so the offsets
    # padding position g is always inside the invalid region; gp is a
    # multiple of 8 by construction (pow2/2^24-multiple buckets >= 4096)
    gp = pad_rows(g + max(k - 1, 1), lo=4096)
    codes = np.full(gp, 4, dtype=np.uint8)  # pad bytes act like N
    codes[:g] = genomes.codes
    # transfer diet: 2-bit pack + N/pad bitmask (0.375 B/base upload)
    cq = codes.reshape(-1, 4)
    codes2 = (cq[:, 0] & 3) | ((cq[:, 1] & 3) << 2) \
        | ((cq[:, 2] & 3) << 4) | ((cq[:, 3] & 3) << 6)
    nmask = np.packbits(codes >= 4, bitorder="little")
    # record starts, padded to a fixed 65 entries with the end position
    # (inside the N pad region: every window there is invalid, so the
    # spurious "start" can never change a real window's record id)
    offsets = np.full(65, g, dtype=np.int32)
    offsets[: genomes.num_records] = genomes.offsets[:-1]
    u_pad = pad_rows(gp - k + 1)

    klo, khi, sid, gc, fs, num_kmers_d, num_sets_d, set_mlo, set_mhi = \
        _build_tables(jnp.asarray(codes2), jnp.asarray(nmask),
                      jnp.asarray(offsets), k=k, u_pad=u_pad)
    # ONE fetch: scalars + the (truncated) set-mask table together
    u, s, mlo_h, mhi_h = jax.device_get(
        (num_kmers_d, num_sets_d, set_mlo, set_mhi))
    u, s = int(u), int(s)
    if s > SMAX:
        return None
    mlo_h = np.ascontiguousarray(mlo_h[:s].astype("<u4"))
    mhi_h = np.ascontiguousarray(mhi_h[:s].astype("<u4"))
    set_masks = np.zeros((s, 8), dtype=np.uint8)
    if s:
        set_masks[:, :4] = mlo_h.view(np.uint8).reshape(s, 4)
        set_masks[:, 4:] = mhi_h.view(np.uint8).reshape(s, 4)
    return dict(
        klo=klo, khi=khi, sid=sid, gc=gc, first_seen=fs,
        num_kmers=u, num_sets=s, set_masks=set_masks,
    )
