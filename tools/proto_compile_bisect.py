#!/usr/bin/env python3
"""Which device-build op explodes compile time with shape size?
Compiles minimal programs at the given size with a fresh cache.
Usage: proto_compile_bisect.py {sort|scan|iota|build} log2size"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

mode, lg = sys.argv[1], int(sys.argv[2])
n = 1 << lg

import numpy as np

from shotgun_tpu.utils.platform import configure_platform

configure_platform()

import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
t0 = time.perf_counter()

if mode == "sort":
    a = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32))
    f = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2,
                                             is_stable=True))
    out = f(a, b, c)
elif mode == "scan":
    a = jnp.asarray(rng.integers(0, 2, n, dtype=np.int32)) > 0
    b = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.uint32))

    def seg(x, y):
        xn, xv = x
        yn, yv = y
        return (xn | yn, jnp.where(yn, yv, xv | yv))
    f = jax.jit(lambda a, b: jax.lax.associative_scan(seg, (a, b)))
    out = f(a, b)
elif mode == "iota":
    f = jax.jit(lambda x: x + jnp.arange(n, dtype=jnp.int32))
    out = f(jnp.zeros(n, jnp.int32))
elif mode == "build":
    from shotgun_tpu.index.device_build import _build_sorted_core
    codes = jnp.asarray(rng.integers(0, 4, n, dtype=np.uint8))
    rs = jnp.zeros(n, dtype=jnp.int32).at[0].set(1)
    f = jax.jit(lambda c, r: _build_sorted_core(c, r, k=31))
    out = f(codes, rs)
jax.block_until_ready(jax.tree.leaves(out)[0])
print(f"{mode} 2^{lg}: compile+run {time.perf_counter() - t0:.1f}s",
      flush=True)
