"""Pallas TPU kernels for the hot per-window ops (SURVEY.md §2.2).

Three kernels cover the pipeline's VPU-bound stages; each is blocked over
the read axis with lane-friendly [block, W] tiles and is validated against
the jnp reference implementations in interpret mode (tests/test_pallas.py):

* ``rolling_encode_pallas``  -- 2-bit pack: codes [B, L] u8 -> k-mer
  (lo, hi) uint32 pairs for every window, the k-step shift recurrence kept
  entirely in VMEM registers (ops/encode.py:rolling_encode_jnp semantics);
* ``window_qsums_pallas``    -- masked quality reduction: raw-ord window
  sums for the MKQ gate (reference kmer.py:401-408 as integer sums);
* ``resolve_rows_pallas``    -- bucket resolve: pre-gathered rows
  [B, W, slots, 4] vs (lo, hi) -> raw (set id, genome count, slot pos),
  the slot loop unrolled to where/minimum chains; the stash merge and
  miss-masking stay in the XLA caller (ops/probe.py:resolve_rows).

Dispatch: ``SHOTGUN_TPU_PALLAS=1`` routes all three call sites
(ops/encode.py:rolling_encode_jnp / window_quality_sums and
ops/probe.py:resolve_rows) through these kernels -- compiled via Mosaic
on TPU, interpret mode elsewhere so the switch is testable on CPU.  The
flag is frozen at first use (see ops/encode.py:pallas_enabled).  The XLA
lowerings stay the production default: bench.py's A/B section measures
both per run, and on the current remote-dispatch runtime loading large
custom kernels can knock the session off its fast dispatch path
(tests/tools/bench_poison.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EMPTY32 = 0xFFFFFFFF


def _block_shape(b: int, target: int = 256) -> Tuple[int, int]:
    """(block rows, padded batch) for a row-blocked grid.

    Rather than shrinking the block to a divisor of b (which degrades to
    1-row blocks for prime batches -- a Mosaic lowering hazard and a
    throughput cliff; ADVICE.md r2 #3), the batch is padded up to a
    sublane-friendly multiple and callers slice the outputs back."""
    nb = -(-b // target)
    bs = -(-(-(-b // nb)) // 8) * 8
    return bs, nb * bs


def _pad_rows(x: jnp.ndarray, bp: int) -> jnp.ndarray:
    b = x.shape[0]
    if b == bp:
        return x
    return jnp.pad(x, ((0, bp - b),) + ((0, 0),) * (x.ndim - 1))


# ---------------------------------------------------------------------------
# rolling 2-bit encode
# ---------------------------------------------------------------------------

def _encode_kernel(codes_ref, lo_ref, hi_ref, *, k: int, w: int):
    lo = jnp.zeros(lo_ref.shape, dtype=jnp.uint32)
    hi = jnp.zeros(hi_ref.shape, dtype=jnp.uint32)
    for j in range(k):
        c = codes_ref[:, j: j + w].astype(jnp.uint32)
        hi = (hi << jnp.uint32(2)) | (lo >> jnp.uint32(30))
        lo = (lo << jnp.uint32(2)) | (c & jnp.uint32(3))
    lo_ref[:, :] = lo
    hi_ref[:, :] = hi


def rolling_encode_pallas(
    codes: jnp.ndarray, k: int, *, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, L] uint8 -> ([B, W], [B, W]) uint32 k-mer (lo, hi) words."""
    b, l = codes.shape
    w = l - k + 1
    bs, bp = _block_shape(b)
    out = jax.ShapeDtypeStruct((bp, w), jnp.uint32)
    lo, hi = pl.pallas_call(
        functools.partial(_encode_kernel, k=k, w=w),
        grid=(bp // bs,),
        in_specs=[pl.BlockSpec((bs, l), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((bs, w), lambda i: (i, 0)),
            pl.BlockSpec((bs, w), lambda i: (i, 0)),
        ),
        out_shape=(out, out),
        interpret=interpret,
    )(_pad_rows(codes, bp))
    return lo[:b], hi[:b]


# ---------------------------------------------------------------------------
# masked window quality sums (MKQ gate)
# ---------------------------------------------------------------------------

def _qsum_kernel(qual_ref, out_ref, *, k: int, w: int):
    acc = jnp.zeros(out_ref.shape, dtype=jnp.int32)
    for j in range(k):
        acc = acc + qual_ref[:, j: j + w].astype(jnp.int32)
    out_ref[:, :] = acc


def window_qsums_pallas(
    qual: jnp.ndarray, k: int, *, interpret: bool = False
) -> jnp.ndarray:
    """[B, L] uint8 raw quality bytes -> [B, W] int32 window sums."""
    b, l = qual.shape
    w = l - k + 1
    bs, bp = _block_shape(b)
    res = pl.pallas_call(
        functools.partial(_qsum_kernel, k=k, w=w),
        grid=(bp // bs,),
        in_specs=[pl.BlockSpec((bs, l), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bs, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, w), jnp.int32),
        interpret=interpret,
    )(_pad_rows(qual, bp))
    return res[:b]


# ---------------------------------------------------------------------------
# bucket-row resolve (compare pre-gathered rows against window keys)
# ---------------------------------------------------------------------------

def _resolve_kernel(*refs, slots: int):
    """Operands: slots x (k0, k1, v0, v1) planes + bidx, lo, hi; outputs
    sid, gc, pos.  Every ref is a lane-friendly [bs, W] tile -- feeding
    the raw [bs, W, slots, 4] block instead makes Mosaic pad the two tiny
    minor dims to full (8, 128) tiles and blows the scoped-vmem budget
    (measured: 118 MB requested for a 128 KB input)."""
    plane_refs = refs[: 4 * slots]
    bidx_ref, lo_ref, hi_ref, sid_ref, gc_ref, pos_ref = refs[4 * slots:]
    lo = lo_ref[:, :]
    hi = hi_ref[:, :]
    bidx = bidx_ref[:, :].astype(jnp.uint32)
    empty = jnp.uint32(_EMPTY32)
    sid = jnp.full(lo.shape, empty, dtype=jnp.uint32)
    gc = jnp.zeros(lo.shape, dtype=jnp.uint32)
    pos = jnp.full(lo.shape, empty, dtype=jnp.uint32)
    for s in range(slots):
        k0 = plane_refs[4 * s][:, :]
        k1 = plane_refs[4 * s + 1][:, :]
        v0 = plane_refs[4 * s + 2][:, :]
        v1 = plane_refs[4 * s + 3][:, :]
        m = (k0 == lo) & (k1 == hi) & (v0 != empty)
        # select-on-match instead of an unsigned min/max reduction: a real
        # table holds each key in at most one slot, so overwriting is
        # exact -- and this Mosaic build cannot legalize vector
        # arith.minui/maxui (the round-2 bench killer)
        sid = jnp.where(m, v0, sid)
        gc = jnp.where(m, v1, gc)
        pos = jnp.where(m, bidx * jnp.uint32(slots) + jnp.uint32(s), pos)
    sid_ref[:, :] = sid
    gc_ref[:, :] = gc
    pos_ref[:, :] = pos


def resolve_rows_pallas(
    rows: jnp.ndarray,   # uint32 [B, W, slots, 4]
    bidx: jnp.ndarray,   # int32  [B, W] bucket indices (for slot_pos)
    lo: jnp.ndarray,     # uint32 [B, W]
    hi: jnp.ndarray,     # uint32 [B, W]
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Raw table resolve: (sid, gc, slot_pos) uint32 [B, W] triples with
    EMPTY sentinels on miss -- the same contract as the XLA table half of
    ``ops.probe.resolve_rows``, which layers the stash merge and final
    miss-masking on top of either implementation."""
    b, w, slots, _ = rows.shape
    bs, bp = _block_shape(b, target=64)
    out = jax.ShapeDtypeStruct((bp, w), jnp.uint32)
    # per-(slot, word) [B, W] planes: lane-friendly tiles for Mosaic (see
    # _resolve_kernel); XLA emits the slices as one fused pass over rows
    planes = [
        _pad_rows(rows[:, :, s, j], bp)
        for s in range(slots) for j in range(4)
    ]
    spec2d = pl.BlockSpec((bs, w), lambda i: (i, 0))
    sid, gc, pos = pl.pallas_call(
        functools.partial(_resolve_kernel, slots=slots),
        grid=(bp // bs,),
        in_specs=[spec2d] * (4 * slots + 3),
        out_specs=(spec2d, spec2d, spec2d),
        out_shape=(out, out, out),
        interpret=interpret,
    )(*planes, _pad_rows(bidx, bp), _pad_rows(lo, bp), _pad_rows(hi, bp))
    return sid[:b], gc[:b], pos[:b]
