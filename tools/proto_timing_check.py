#!/usr/bin/env python3
"""Is the remote runtime memoizing identical dispatches?  Times the same
sort with (a) the same input every call vs (b) a different input each
call, and an iter-count scaling check."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ITERS = 10
rng = np.random.default_rng(0)
n = 3_129_770

jfn = jax.jit(lambda a, c: jax.lax.sort((a, c), num_keys=1, is_stable=True))

# (a) same input
a = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
c = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32))
jax.block_until_ready(jfn(a, c))
t0 = time.perf_counter()
for _ in range(ITERS):
    out = jfn(a, c)
jax.block_until_ready(out)
print(f"same input : {(time.perf_counter() - t0) / ITERS * 1e3:8.3f} ms")

# (b) different inputs
arrs = [(jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32)),
         jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32)))
        for _ in range(ITERS)]
jax.block_until_ready(arrs)
t0 = time.perf_counter()
outs = [jfn(x, y) for x, y in arrs]
jax.block_until_ready(outs)
print(f"diff inputs: {(time.perf_counter() - t0) / ITERS * 1e3:8.3f} ms")

# (c) perturb on device per call (fresh value, one extra add)
@jax.jit
def step(a, c, i):
    return jax.lax.sort((a + i, c), num_keys=1, is_stable=True)
jax.block_until_ready(step(a, c, jnp.uint32(0)))
iotas = [jnp.uint32(i + 1) for i in range(ITERS)]
t0 = time.perf_counter()
outs = [step(a, c, i) for i in iotas]
jax.block_until_ready(outs)
print(f"perturbed  : {(time.perf_counter() - t0) / ITERS * 1e3:8.3f} ms")
