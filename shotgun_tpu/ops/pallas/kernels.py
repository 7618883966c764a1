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


def _block_rows(b: int, target: int = 256) -> int:
    """Largest divisor of b that is <= target (grid must tile exactly)."""
    bs = min(b, target)
    while b % bs:
        bs -= 1
    return bs


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
    bs = _block_rows(b)
    out = jax.ShapeDtypeStruct((b, w), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_encode_kernel, k=k, w=w),
        grid=(b // bs,),
        in_specs=[pl.BlockSpec((bs, l), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((bs, w), lambda i: (i, 0)),
            pl.BlockSpec((bs, w), lambda i: (i, 0)),
        ),
        out_shape=(out, out),
        interpret=interpret,
    )(codes)


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
    bs = _block_rows(b)
    return pl.pallas_call(
        functools.partial(_qsum_kernel, k=k, w=w),
        grid=(b // bs,),
        in_specs=[pl.BlockSpec((bs, l), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bs, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, w), jnp.int32),
        interpret=interpret,
    )(qual)


# ---------------------------------------------------------------------------
# bucket-row resolve (compare pre-gathered rows against window keys)
# ---------------------------------------------------------------------------

def _resolve_kernel(rows_ref, bidx_ref, lo_ref, hi_ref,
                    sid_ref, gc_ref, pos_ref, *, slots: int):
    lo = lo_ref[:, :]
    hi = hi_ref[:, :]
    bidx = bidx_ref[:, :].astype(jnp.uint32)
    empty = jnp.uint32(_EMPTY32)
    sid = jnp.full(lo.shape, empty, dtype=jnp.uint32)
    gc = jnp.zeros(lo.shape, dtype=jnp.uint32)
    pos = jnp.full(lo.shape, empty, dtype=jnp.uint32)
    for s in range(slots):
        k0 = rows_ref[:, :, s, 0]
        k1 = rows_ref[:, :, s, 1]
        v0 = rows_ref[:, :, s, 2]
        v1 = rows_ref[:, :, s, 3]
        m = (k0 == lo) & (k1 == hi) & (v0 != empty)
        # min/max across matching slots: identical to ops.probe.resolve_rows
        # (a real table matches at most one slot; the reduction direction
        # only matters for malformed tables and tests)
        sid = jnp.minimum(sid, jnp.where(m, v0, empty))
        gc = jnp.maximum(gc, jnp.where(m, v1, jnp.uint32(0)))
        pos = jnp.minimum(
            pos,
            jnp.where(m, bidx * jnp.uint32(slots) + jnp.uint32(s), empty),
        )
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
    bs = _block_rows(b, target=64)
    out = jax.ShapeDtypeStruct((b, w), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_resolve_kernel, slots=slots),
        grid=(b // bs,),
        in_specs=[
            pl.BlockSpec((bs, w, slots, 4), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bs, w), lambda i: (i, 0)),
            pl.BlockSpec((bs, w), lambda i: (i, 0)),
            pl.BlockSpec((bs, w), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bs, w), lambda i: (i, 0)),
            pl.BlockSpec((bs, w), lambda i: (i, 0)),
            pl.BlockSpec((bs, w), lambda i: (i, 0)),
        ),
        out_shape=(out, out, out),
        interpret=interpret,
    )(rows, bidx, lo, hi)
