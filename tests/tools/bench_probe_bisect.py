"""Bisect probe_kmers to find what costs 30ms/step."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from shotgun_tpu.ops.encode import mix32

NB = 262_144
B, W = 8192, 120
EMPTY = jnp.uint32(0xFFFFFFFF)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter() - t0) / 10 * 1e3:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**32, size=(NB, 8, 4), dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 2**32, size=(B, W), dtype=np.uint32))
    hi = jnp.asarray(rng.integers(0, 2**32, size=(B, W), dtype=np.uint32))

    def v_mix_only(lo, hi):
        return mix32(lo, hi, jnp) & jnp.uint32(NB - 1)

    timeit("mix32 only", jax.jit(v_mix_only), lo, hi)

    def v_gather_only(t, lo, hi):
        b0 = mix32(lo, hi, jnp) & jnp.uint32(NB - 1)
        rows = jnp.take(t, b0.astype(jnp.int32), axis=0)
        return rows.sum(axis=(-1, -2))

    timeit("mix + gather + sum", jax.jit(v_gather_only), table, lo, hi)

    def v_gather_cmp(t, lo, hi):
        b0 = mix32(lo, hi, jnp) & jnp.uint32(NB - 1)
        rows = jnp.take(t, b0.astype(jnp.int32), axis=0)
        match = (rows[..., 0] == lo[..., None]) & (rows[..., 1] == hi[..., None]) \
            & (rows[..., 2] != EMPTY)
        return match.sum()

    timeit("mix + gather + compare", jax.jit(v_gather_cmp), table, lo, hi)

    def v_full_step(t, lo, hi):
        b0 = mix32(lo, hi, jnp) & jnp.uint32(NB - 1)
        rows = jnp.take(t, b0.astype(jnp.int32), axis=0)
        match = (rows[..., 0] == lo[..., None]) & (rows[..., 1] == hi[..., None]) \
            & (rows[..., 2] != EMPTY)
        sid = jnp.min(jnp.where(match, rows[..., 2], EMPTY), axis=-1)
        gc = jnp.max(jnp.where(match, rows[..., 3], jnp.uint32(0)), axis=-1)
        return sid, gc

    timeit("full single probe step", jax.jit(v_full_step), table, lo, hi)

    from shotgun_tpu.ops.probe import probe_kmers
    timeit("probe_kmers steps=1",
           jax.jit(lambda t, a, b: probe_kmers(t, a, b, 1)), table, lo, hi)
    timeit("probe_kmers steps=5",
           jax.jit(lambda t, a, b: probe_kmers(t, a, b, 5)), table, lo, hi)

    # variant: transpose table layout [4, NB*8]? try flat col arrays
    cols = [jnp.asarray(np.ascontiguousarray(
        np.asarray(table).reshape(NB, 32)[:, j])) for j in range(4)]

    def v_col_gather(c0, c1, c2, lo, hi):
        b0 = mix32(lo, hi, jnp) & jnp.uint32(NB - 1)
        i = b0.astype(jnp.int32)
        return jnp.take(c0, i) + jnp.take(c1, i) + jnp.take(c2, i)

    timeit("3x scalar col gathers", jax.jit(v_col_gather),
           cols[0], cols[1], cols[2], lo, hi)


if __name__ == "__main__":
    main()
