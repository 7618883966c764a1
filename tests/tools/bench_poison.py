"""Measurement harness for the gather-fusion dispatch cliff on TPU.

Findings (v5e via remote dispatch, 2026-08-18) that shape the pipeline's
two-dispatch structure (models/pipeline.py, ops/probe.py):

* a standalone large gather (``jnp.take`` whose output is returned or only
  reduced) executes in ~0.05-0.1 ms per 1M rows and keeps the session on
  the fast async-dispatch path;
* a large gather FUSED with elementwise consumers (compare, add, select
  against another tensor) compiles into a loop fusion that costs ~28 ms,
  and -- on the remote-dispatch runtime -- merely COMPILING such a program
  permanently degrades every subsequent dispatch in the session to ~29 ms
  fixed latency (sync dispatch), even for previously-fast executables;
* sorts (2M x 5 operands ~0.04 ms amortized), cumulative scans,
  associative_scan, small take_along_axis, and elementwise broadcasts are
  all safe.

Therefore: every large gather in the hot path runs as its own jitted
program whose outputs feed a second, gather-free program.

Run:  python tests/tools/bench_poison.py <variant>
Variants: standalone_probe | gather_eq | gather_add | take_along_axis |
          cummax_scan | sortpipe
Each run isolates one pattern in a fresh process and reports whether the
control kernel (standalone gather+sum) stays fast afterwards.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from shotgun_tpu.ops.encode import mix32, rolling_encode_jnp  # noqa: E402

B, W, K = 8192, 120, 31
NB = 1 << 19


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "standalone_probe"
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, size=(B, 150), dtype=np.uint8))
    a = jnp.asarray(rng.integers(0, 2**32, size=(B, W), dtype=np.uint32))
    idx2d = jnp.asarray(rng.integers(0, NB, size=(B, W), dtype=np.int32))
    tbl = jnp.asarray(rng.integers(0, 2**32, size=(NB, 8, 4), dtype=np.uint32))
    control = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())

    def check(tag):
        out = control(tbl, idx2d)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = control(tbl, idx2d)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10 * 1e3
        state = "POISONED" if dt > 5 else "ok"
        print(f"[{variant}] control {tag}: {dt:.2f} ms {state}", flush=True)

    def timeit(name, fn, *args, n=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        print(f"[{variant}] {name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms",
              flush=True)

    check("pre")
    if variant == "standalone_probe":
        @jax.jit
        def f1(t, codes):
            lo, hi = rolling_encode_jnp(codes, K)
            bidx = (mix32(lo, hi, jnp) & jnp.uint32(NB - 1)).astype(jnp.int32)
            return jnp.take(t, bidx, axis=0), lo, hi

        @jax.jit
        def f2(rows, lo, hi):
            match = (rows[..., 0] == lo[..., None]) & (rows[..., 1] == hi[..., None])
            sid = jnp.min(
                jnp.where(match, rows[..., 2], jnp.uint32(0xFFFFFFFF)), axis=-1)
            return sid.astype(jnp.int32).sum()

        timeit("split probe (2 dispatches)",
               lambda t, c: f2(*f1(t, c)[:1], *f1(t, c)[1:]), tbl, codes)
    elif variant == "gather_eq":
        f = jax.jit(lambda t, x: (jnp.take(t, idx2d, axis=0)[..., 0]
                                  == x[..., None]).sum())
        f.lower(tbl, a).compile()
    elif variant == "gather_add":
        f = jax.jit(lambda t, x: (jnp.take(t, idx2d, axis=0)[..., 0]
                                  + x[..., None]).sum())
        f.lower(tbl, a).compile()
    elif variant == "take_along_axis":
        tc = jnp.asarray(rng.integers(0, 100, size=(B, 8), dtype=np.int32))
        wn = jnp.asarray(rng.integers(0, 8, size=(B,), dtype=np.int32))
        f = jax.jit(lambda tc, wn: (jnp.take_along_axis(tc, wn[:, None], axis=1)[:, 0]
                                    - tc.max(axis=1)).sum())
        jax.block_until_ready(f(tc, wn))
    elif variant == "cummax_scan":
        x = jnp.asarray(rng.integers(0, 2**31, size=(2_000_000,), dtype=np.int32))
        jax.block_until_ready(jax.jit(lambda x: (jax.lax.cummax(x) - x).sum())(x))
    elif variant == "sortpipe":
        x = jnp.asarray(rng.integers(0, 2**31, size=(2_000_000,), dtype=np.uint32))
        v = jnp.arange(2_000_000, dtype=jnp.int32)
        f = jax.jit(lambda x, v: jax.lax.sort((x, x, v, v, v), num_keys=2)[2].sum())
        timeit("sort 2M x5 2key", f, x, v)
    check("post")


if __name__ == "__main__":
    main()
