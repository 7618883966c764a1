"""Pallas kernels vs their jnp reference implementations (interpret mode,
so the suite runs on CPU; on TPU the same kernels compile via Mosaic)."""

import numpy as np
import jax.numpy as jnp
import pytest

from shotgun_tpu.ops.encode import rolling_encode_jnp, window_quality_sums
from shotgun_tpu.ops.pallas.kernels import (
    resolve_rows_pallas,
    rolling_encode_pallas,
    window_qsums_pallas,
)
from shotgun_tpu.ops.probe import resolve_rows


@pytest.mark.parametrize("b,l,k", [(32, 60, 11), (64, 150, 31), (8, 40, 7)])
def test_rolling_encode_matches(b, l, k):
    rng = np.random.default_rng(b + k)
    codes = jnp.asarray(rng.integers(0, 4, size=(b, l), dtype=np.uint8))
    lo_p, hi_p = rolling_encode_pallas(codes, k, interpret=True)
    lo_r, hi_r = rolling_encode_jnp(codes, k)
    np.testing.assert_array_equal(np.asarray(lo_p), np.asarray(lo_r))
    np.testing.assert_array_equal(np.asarray(hi_p), np.asarray(hi_r))


@pytest.mark.parametrize("b,l,k", [(32, 60, 11), (16, 150, 31)])
def test_window_qsums_matches(b, l, k):
    rng = np.random.default_rng(b * k)
    qual = jnp.asarray(rng.integers(33, 127, size=(b, l), dtype=np.uint8))
    out_p = window_qsums_pallas(qual, k, interpret=True)
    out_r = window_quality_sums(qual, k)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_r))


@pytest.mark.parametrize("slots", [4, 8])
def test_resolve_rows_matches(slots):
    rng = np.random.default_rng(slots)
    b, w = 16, 30
    lo = jnp.asarray(rng.integers(0, 8, size=(b, w), dtype=np.uint32))
    hi = jnp.asarray(rng.integers(0, 2, size=(b, w), dtype=np.uint32))
    rows = jnp.asarray(
        rng.integers(0, 8, size=(b, w, slots, 4), dtype=np.uint32))
    # plant some exact matches and some empty slots
    rows = rows.at[:, ::3, 0, 0].set(lo[:, ::3])
    rows = rows.at[:, ::3, 0, 1].set(hi[:, ::3])
    rows = rows.at[:, ::5, :, 2].set(np.uint32(0xFFFFFFFF))

    hit_p, sid_p, gc_p = resolve_rows_pallas(rows, lo, hi, interpret=True)
    bidx = jnp.zeros((b, w), dtype=jnp.int32)
    hit_r, sid_r, gc_r, _ = resolve_rows(
        rows, bidx, jnp.zeros((0, 4), jnp.uint32), lo, hi)
    np.testing.assert_array_equal(np.asarray(hit_p), np.asarray(hit_r))
    hp = np.asarray(hit_p)
    np.testing.assert_array_equal(np.asarray(sid_p)[hp], np.asarray(sid_r)[hp])
    np.testing.assert_array_equal(np.asarray(gc_p)[hp], np.asarray(gc_r)[hp])
