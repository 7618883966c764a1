"""Vectorized hash-table probe: read k-mer windows -> genome-set ids.

The device-side half of the bucketized table in index/hashtable.py.  One
probe step gathers a whole bucket row ([SLOTS, 4] uint32) per window and
compares all slot keys in vector lanes; spill buckets are unrolled
statically up to the build-time maximum probe distance.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from shotgun_tpu.index.hashtable import EMPTY, SLOTS
from shotgun_tpu.ops.encode import mix32

_EMPTY32 = jnp.uint32(0xFFFFFFFF)


def probe_kmers(
    table: jnp.ndarray,      # uint32 [n_buckets, SLOTS, 4]
    lo: jnp.ndarray,         # uint32 [B, W]
    hi: jnp.ndarray,         # uint32 [B, W]
    max_bucket_probe: int,   # static
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Look up every window's k-mer.

    Returns (hit [B,W] bool, set_id [B,W] int32, genome_count [B,W] int32);
    misses have set_id == -1 and genome_count == 0.
    """
    n_buckets = table.shape[0]
    mask = jnp.uint32(n_buckets - 1)
    b0 = mix32(lo, hi, jnp) & mask

    found_sid = jnp.full(lo.shape, _EMPTY32, dtype=jnp.uint32)
    found_gc = jnp.zeros(lo.shape, dtype=jnp.uint32)
    for step in range(max_bucket_probe):
        bidx = (b0 + jnp.uint32(step)) & mask
        rows = jnp.take(table, bidx.astype(jnp.int32), axis=0)  # [B, W, SLOTS, 4]
        match = (
            (rows[..., 0] == lo[..., None])
            & (rows[..., 1] == hi[..., None])
            & (rows[..., 2] != _EMPTY32)
        )
        sid = jnp.min(jnp.where(match, rows[..., 2], _EMPTY32), axis=-1)
        gc = jnp.max(jnp.where(match, rows[..., 3], jnp.uint32(0)), axis=-1)
        found_sid = jnp.minimum(found_sid, sid)
        found_gc = jnp.maximum(found_gc, gc)

    hit = found_sid != _EMPTY32
    set_id = jnp.where(hit, found_sid, jnp.uint32(0)).astype(jnp.int32)
    set_id = jnp.where(hit, set_id, jnp.int32(-1))
    genome_count = found_gc.astype(jnp.int32)
    return hit, set_id, genome_count
