"""Measure XLA TPU gather throughput vs row size, to size the probe table."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

N_ROWS = 262_144          # table rows
N_QUERIES = 8192 * 120    # one batch of window queries
N_ITER = 10


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITER
    print(f"{name:40s} {dt * 1e3:8.2f} ms   {N_QUERIES / dt / 1e6:7.1f} M rows/s")


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N_ROWS, size=N_QUERIES, dtype=np.int32))
    idx2d = idx.reshape(8192, 120)

    for row_elems in [1, 2, 3, 4, 8, 16, 24, 32]:
        tbl = jnp.asarray(
            rng.integers(0, 2**31, size=(N_ROWS, row_elems), dtype=np.int32))
        fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(axis=-1))
        timeit(f"row gather {row_elems * 4:4d}B ([N,{row_elems}])", fn, tbl, idx)

    # 2D index version (as used in probe)
    tbl = jnp.asarray(rng.integers(0, 2**31, size=(N_ROWS, 8, 4), dtype=np.int32))
    fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(axis=(-1, -2)))
    timeit("bucket gather 128B ([N,8,4]) 2d-idx", fn, tbl, idx2d)

    # flat scalar gather
    tbl1 = jnp.asarray(rng.integers(0, 2**31, size=(N_ROWS * 8,), dtype=np.int32))
    fn = jax.jit(lambda t, i: jnp.take(t, i))
    timeit("scalar gather 4B flat", fn, tbl1, idx)

    # gather via one_hot matmul on small table (sanity alternative)
    small = jnp.asarray(rng.integers(0, 2**31, size=(512, 8), dtype=np.int32))
    sidx = idx % 512
    fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(axis=-1))
    timeit("row gather 32B small table (512 rows)", fn, small, sidx)


if __name__ == "__main__":
    main()
