"""Data-parallel pseudo-alignment over a device mesh.

Reads are the data-parallel axis (SURVEY.md §2.2): each device aligns its
shard of the batch with the probe table replicated, then per-genome count
vectors and filter counters merge with exact integer ``psum`` collectives
and first-encounter order keys with ``pmin`` -- so dumpalign output is
invariant to the shard count by construction.

Two equivalent paths are provided:

* ``align_aggregate_sharded`` -- explicit ``shard_map`` + psum/pmin
  (the collectives are visible; this is the scalable production path);
* plain ``models.pipeline.align_batch`` under a sharded ``jit`` -- GSPMD
  inserts the same collectives automatically (used by tests to cross-check).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shotgun_tpu.models.pipeline import (
    AggResult,
    aggregate_batch,
    align_batch_core,
)


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(devs, (axis,))


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "k", "has_mrq", "has_mkq", "has_mg",
    ),
)
def align_aggregate_sharded(
    probe_tab,
    set_member,
    codes,
    qual,
    lengths,
    row_valid,
    m,
    p,
    mrq,
    mkq,
    mg,
    *,
    mesh: Mesh,
    k: int,
    has_mrq: bool,
    has_mkq: bool,
    has_mg: bool,
) -> AggResult:
    """Shard reads over the mesh's 'data' axis; return globally-merged
    aggregation (identical to single-device ``aggregate_batch``)."""
    n_shards = mesh.shape["data"]
    b = codes.shape[0]
    rows_per_shard = b // n_shards
    r = set_member.shape[1]

    def shard_fn(probe_tab, set_member, codes, qual, lengths, row_valid,
                 m, p, mrq, mkq, mg):
        res = align_batch_core(
            probe_tab, set_member, codes, qual, lengths, m, p, mrq, mkq, mg,
            k=k, has_mrq=has_mrq, has_mkq=has_mkq, has_mg=has_mg,
        )
        local = aggregate_batch(res, row_valid)
        # lift shard-local first-encounter keys to global read order:
        # global_row = shard_idx * rows_per_shard + local_row
        shard_idx = jax.lax.axis_index("data")
        offset = shard_idx.astype(jnp.int32) * jnp.int32(rows_per_shard * (r + 2))
        big = jnp.int32(0x3FFFFFFF)
        lifted = jnp.where(local.first_key < big, local.first_key + offset, big)
        psum = lambda x: jax.lax.psum(x, "data")
        return AggResult(
            n_unique=psum(local.n_unique),
            n_ambiguous=psum(local.n_ambiguous),
            n_unmapped=psum(local.n_unmapped),
            n_filtered_reads=psum(local.n_filtered_reads),
            n_filtered_kmers=psum(local.n_filtered_kmers),
            n_hr_kmers=psum(local.n_hr_kmers),
            unique_by_rec=psum(local.unique_by_rec),
            amb_by_rec=psum(local.amb_by_rec),
            first_key=jax.lax.pmin(lifted, "data"),
        )

    import jax.tree_util as jtu
    tab_specs = jtu.tree_map(lambda _: P(), probe_tab)
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            tab_specs, P(),                 # probe tables + set_member: replicated
            P("data"), P("data"), P("data"), P("data"),  # read arrays
            P(), P(), P(), P(), P(),        # scalars
        ),
        out_specs=P(),                      # fully merged, replicated
    )(probe_tab, set_member, codes, qual, lengths, row_valid,
      m, p, mrq, mkq, mg)


def shard_read_arrays(mesh: Mesh, *arrays):
    """device_put read-batch arrays with batch-dim sharding."""
    out = []
    for arr in arrays:
        spec = P("data") if arr.ndim == 1 else P("data", *([None] * (arr.ndim - 1)))
        out.append(jax.device_put(arr, NamedSharding(mesh, spec)))
    return tuple(out)


def replicate(mesh: Mesh, *arrays):
    out = []
    for arr in arrays:
        out.append(jax.device_put(arr, NamedSharding(mesh, P())))
    return tuple(out)
