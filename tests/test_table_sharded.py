"""Tensor-parallel (sharded-table) probe: output must be invariant to the
('data', 'table') mesh shape and equal the single-device result exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shotgun_tpu.index.build import build_index
from shotgun_tpu.models.pipeline import align_batch
from shotgun_tpu.ops.probe_sort import SortedTableDev, sorted_table_host
from shotgun_tpu.parallel.mesh import replicate, shard_read_arrays
from shotgun_tpu.parallel.table_sharded import (
    align_aggregate_table_sharded,
    device_put_sharded_table,
    make_mesh_2d,
    pad_table_for_sharding,
)
from shotgun_tpu.reference import KmerReference
from shotgun_tpu.utils.synth import synth_genomes, synth_reads

K, L, B = 11, 60, 64


def _setup():
    rng = np.random.default_rng(7)
    genomes = synth_genomes(rng, 4, 3000)
    reads = synth_reads(rng, genomes, B, L)
    idx = build_index(genomes, K)
    ref = KmerReference(K, _index=idx)
    member = ref.set_member_dense()
    tab_host = sorted_table_host(idx)
    return reads, member, tab_host


@pytest.mark.parametrize("data,table", [(4, 2), (2, 4), (1, 8), (8, 1)])
def test_table_sharded_matches_single_device(data, table):
    if len(jax.devices()) < data * table:
        pytest.skip("needs 8 virtual devices")
    reads, member, tab_host = _setup()
    one = jnp.int32(1)
    zero = jnp.int32(0)
    kw = dict(k=K, has_mrq=False, has_mkq=True, has_mg=True)

    # single-device reference result
    tab1 = SortedTableDev(*map(jnp.asarray, tab_host))
    _, agg1 = align_batch(
        tab1, jnp.asarray(member),
        jnp.asarray(reads.codes), jnp.asarray(reads.qual),
        jnp.asarray(reads.lengths), jnp.ones(B, bool),
        one, one, zero, jnp.int32(60), jnp.int32(2),
        with_aggregate=True, **kw)

    mesh = make_mesh_2d(jax.devices()[: data * table], data=data, table=table)
    tab_p = pad_table_for_sharding(tab_host, table)
    tab_d = device_put_sharded_table(mesh, tab_p)
    (member_d,) = replicate(mesh, member)
    codes_d, qual_d, len_d, rv_d = shard_read_arrays(
        mesh, reads.codes, reads.qual, reads.lengths, np.ones(B, bool))
    agg_n = align_aggregate_table_sharded(
        tab_d, member_d, codes_d, qual_d, len_d, rv_d,
        one, one, zero, jnp.int32(60), jnp.int32(2),
        mesh=mesh, **kw)

    for field in agg1._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(agg1, field)), np.asarray(getattr(agg_n, field)),
            err_msg=f"{field} differs on {data}x{table} mesh")
