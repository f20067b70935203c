#!/usr/bin/env python
"""Compare splat backends on the real chip: XLA scan vs v3 batched kernel.

Also times the full fused corruption (corrupt_batch) before/after. Uses the
chained-carry + final-fetch methodology (see .claude/skills/verify).
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
jax.config.update('jax_compilation_cache_dir', '/root/.jax_compile_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import jax.numpy as jnp
import numpy as np

from awsegbench.core.prng import per_sample_keys
from awsegbench.weather import corruption as C

B, H, W = 8, 512, 1024
MEASURE = 8


def chain(fn, args_list, warmup=2):
    acc = jnp.zeros((), jnp.float32)
    f = jax.jit(lambda a, *xs: a + fn(*xs), donate_argnums=(0,))
    for i in range(warmup):
        acc = f(acc, *args_list[i % len(args_list)])
    float(acc)
    t0 = time.perf_counter()
    for i in range(MEASURE):
        acc = f(acc, *args_list[i % len(args_list)])
    float(acc)
    return (time.perf_counter() - t0) / MEASURE


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    batches = []
    for i in range(2):
        batches.append((
            jax.device_put(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8)),
            jax.device_put(rng.integers(0, 5, (B,)).astype(np.int32)),
            jax.device_put(per_sample_keys(jax.random.fold_in(key, i),
                                           jnp.arange(B, dtype=jnp.int32))),
        ))

    # full fused corruption (new kernel picked automatically on TPU)
    dt = chain(lambda im, wid, k: C.corrupt_batch(im, wid, k)
               .astype(jnp.float32).sum() * 1e-30, batches)
    print(f"corrupt_batch (v3 kernel): {dt*1e3:.2f} ms/B{B}", flush=True)

    # splat-only: rain params for all samples, both backends
    def splat_args(im, wid, k):
        i_rain, rx, ry, rex, rey, rrad, rvalid = jax.vmap(
            lambda kk: C._rain_splat_params(kk, H, W))(k)
        return rx, ry, rex, rey, rrad, rvalid

    def run_scan(im, wid, k):
        rx, ry, rex, rey, rrad, rvalid = splat_args(im, wid, k)
        cov = jax.vmap(lambda a1, a2, b1, b2, r, v:
                       C._segment_coverage(H, W, a1, a2, b1, b2, r, v))(
            rx, ry, rex, rey, rrad, rvalid)
        return cov.astype(jnp.float32).sum() * 1e-30

    def run_v3(im, wid, k):
        from awsegbench.ops.splat import (prepare_splat_batch,
                                          splat_coverage_batched)
        rx, ry, rex, rey, rrad, rvalid = splat_args(im, wid, k)
        nv, params, winpos = jax.vmap(
            lambda a1, a2, b1, b2, r, v: prepare_splat_batch(
                a1, a2, b1, b2, r, v, H, W))(rx, ry, rex, rey, rrad, rvalid)
        cov = splat_coverage_batched(nv, params, winpos, H, W)
        return cov.sum() * 1e-30

    dt_scan = chain(run_scan, batches)
    print(f"splat scan path:  {dt_scan*1e3:.2f} ms/B{B}", flush=True)
    dt_v3 = chain(run_v3, batches)
    print(f"splat v3 kernel:  {dt_v3*1e3:.2f} ms/B{B}", flush=True)

    # parity check on-chip
    im, wid, k = batches[0]
    rx, ry, rex, rey, rrad, rvalid = jax.jit(splat_args)(im, wid, k)
    from awsegbench.ops.splat import (prepare_splat_batch,
                                      splat_coverage_batched)
    nv, params, winpos = jax.jit(jax.vmap(
        lambda a1, a2, b1, b2, r, v: prepare_splat_batch(
            a1, a2, b1, b2, r, v, H, W)))(rx, ry, rex, rey, rrad, rvalid)
    got = np.asarray(splat_coverage_batched(nv, params, winpos, H, W)) > 0.5
    ref = np.asarray(jax.jit(jax.vmap(
        lambda a1, a2, b1, b2, r, v:
        C._segment_coverage(H, W, a1, a2, b1, b2, r, v)))(
        rx, ry, rex, rey, rrad, rvalid))
    print("on-chip parity:", bool((got == ref).all()),
          f"({(got != ref).sum()} mismatched px)", flush=True)


if __name__ == '__main__':
    main()
