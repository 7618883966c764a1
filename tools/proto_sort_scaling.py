#!/usr/bin/env python3
"""Primitive-cost measurements on the attached TPU: lax.sort scaling with
(rows, num_keys, num_operands), gather/scatter rates, minor-axis sorts,
and a bitonic-merge stage -- the data that decides the probe redesign.
Usage: python tools/proto_sort_scaling.py [iters]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10


def timed(label, jfn, *args):
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jfn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:46s} {ms:9.3f} ms")
    return ms


def main():
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    for n in (2_097_152, 3_129_770):
        print(f"\n--- lax.sort, n={n:,} ---")
        a = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        c = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32))
        d = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32))
        e = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32))

        timed("sort 1key u32 stable", jax.jit(
            lambda a: jax.lax.sort((a,), num_keys=1, is_stable=True)), a)
        timed("sort 1key+1payload stable", jax.jit(
            lambda a, c: jax.lax.sort((a, c), num_keys=1, is_stable=True)),
            a, c)
        timed("sort 1key+2payload stable", jax.jit(
            lambda a, c, d: jax.lax.sort((a, c, d), num_keys=1,
                                         is_stable=True)), a, c, d)
        timed("sort 1key+3payload stable", jax.jit(
            lambda a, c, d, e: jax.lax.sort((a, c, d, e), num_keys=1,
                                            is_stable=True)), a, c, d, e)
        timed("sort 2key+1payload stable", jax.jit(
            lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2,
                                         is_stable=True)), a, b, c)
        timed("sort 2key+2payload stable", jax.jit(
            lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=2,
                                            is_stable=True)), a, b, c, d)
        timed("sort 1key+1payload UNstable", jax.jit(
            lambda a, c: jax.lax.sort((a, c), num_keys=1, is_stable=False)),
            a, c)

    print("\n--- gathers (idx into 1M-row table) ---")
    u = 1_000_000
    for n in (2_097_152,):
        idx = jnp.asarray(rng.integers(0, u, n, dtype=np.int32))
        tab1 = jnp.asarray(rng.integers(0, 2**31, u, dtype=np.int32))
        tab4 = jnp.asarray(
            rng.integers(0, 2**31, (u, 4), dtype=np.int32))
        timed(f"gather 1 word  x{n:,}", jax.jit(
            lambda t, i: jnp.take(t, i, axis=0)), tab1, idx)
        timed(f"gather 4 words x{n:,}", jax.jit(
            lambda t, i: jnp.take(t, i, axis=0)), tab4, idx)

    print("\n--- scatter-add n=2.1M into [16384, 8] ---")
    n = 2_097_152
    sidx = jnp.asarray(rng.integers(0, 16384 * 8, n, dtype=np.int32))
    ones = jnp.ones(n, jnp.int32)
    timed("scatter-add", jax.jit(
        lambda i, v: jnp.zeros(16384 * 8, jnp.int32).at[i].add(v)),
        sidx, ones)

    print("\n--- minor-axis (per-read) sort [16384, W] ---")
    for w in (128, 256):
        x = jnp.asarray(
            rng.integers(0, 2**32, (16384, w), dtype=np.uint32))
        v = jnp.asarray(
            rng.integers(0, 2**31, (16384, w), dtype=np.int32))
        timed(f"rowwise sort 1key+1payload W={w}", jax.jit(
            lambda x, v: jax.lax.sort((x, v), dimension=1, num_keys=1,
                                      is_stable=True)), x, v)

    print("\n--- bitonic merge stage (3.1M, 4 operands, stride 2^18) ---")
    m = 4_194_304
    xs = [jnp.asarray(rng.integers(0, 2**31, m, dtype=np.int32))
          for _ in range(4)]

    def stage(a, b, c, d):
        s = 1 << 18
        ar = a.reshape(-1, 2, s)
        swap = ar[:, 0] > ar[:, 1]
        outs = []
        for x in (a, b, c, d):
            xr = x.reshape(-1, 2, s)
            lo = jnp.where(swap, xr[:, 1], xr[:, 0])
            hi = jnp.where(swap, xr[:, 0], xr[:, 1])
            outs.append(jnp.stack([lo, hi], 1).reshape(-1))
        return tuple(outs)
    timed("one merge stage", jax.jit(stage), *xs)

    def merge22(a, b, c, d):
        for st in range(22):
            s = 1 << (21 - st)
            ar = a.reshape(-1, 2, s)
            swap = ar[:, 0] > ar[:, 1]
            res = []
            for x in (a, b, c, d):
                xr = x.reshape(-1, 2, s)
                lo = jnp.where(swap, xr[:, 1], xr[:, 0])
                hi = jnp.where(swap, xr[:, 0], xr[:, 1])
                res.append(jnp.stack([lo, hi], 1).reshape(-1))
            a, b, c, d = res
        return a, b, c, d
    timed("full 22-stage bitonic merge (4 ops)", jax.jit(merge22), *xs)


if __name__ == "__main__":
    main()
