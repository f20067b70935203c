#!/usr/bin/env python
"""On-chip checks for the train-mode head kernels (real-TPU-only paths).

The interpreter-mode pytest parity suite covers the math; this script
verifies what only the real chip can:

  1. Mosaic lowering at the production shape [8,16,32,256] (bf16).
  2. seg explicit-``mask`` mode: exact parity vs the XLA literal
     composition ON CHIP (same tolerance as the CPU tests).
  3. seg counter-hash dropout mode: determinism (same seeds ->
     bit-identical out), exact forward parity vs the literal composition
     drawing the SAME mask via ``dropout_keep_mask``, and exact GRADIENT
     parity vs that composition's autodiff — the gradients agree only if
     the backward kernel regenerates the forward's mask.
  4. depth counter-hash mode: the same exact forward + gradient parity
     (the hash is XLA-computable, so parity is exact even for the
     stochastic path).
  5. keep-rate sanity of the hash stream.

Usage: python scripts/tpu_kernel_checks.py
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
from jax import lax

from awsegbench.models.heads import BN_EPS
from awsegbench.ops.depthkernels_train import (depth_stage1_fused_train,
                                               dropout_keep_mask)
from awsegbench.ops.headkernels_train import seg_head_fused_train
from awsegbench.ops.resize import upsample_like

PROD = dict(b=8, h=16, w=32, cin=256, c1=256, nc=19, r=32)
SMALL = dict(b=2, h=4, w=8, cin=64, c1=128, nc=19, r=8)


def _conv(x, k, b=None, hi=True):
    y = lax.conv_general_dilated(
        x, k, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        precision=lax.Precision.HIGHEST if hi else lax.Precision.DEFAULT)
    return y if b is None else y + b


def hi_jit(fn):
    """jit a reference composition with every DEFAULT-precision matmul
    forced to HIGHEST at trace time. The exact-stream parity references
    must compute at true f32: DEFAULT matmul precision on TPU is
    single-pass bf16 (~2e-3 rel error), which is what the r4/r5 'seg
    kernel wrong on chip' reports actually measured — the KERNEL (whose
    f32 matmuls request HIGHEST explicitly, `_mm_prec`) was float-exact
    all along (2.2e-7 vs a HIGHEST composition on chip). Scoped to the
    reference trace only: a global flag would also retarget the kernel's
    precision=None bf16 dots, which Mosaic rejects (`Bad lhs type`)."""
    @jax.jit
    def wrapped(*a):
        with jax.default_matmul_precision('highest'):
            return fn(*a)
    return wrapped


def make_args(cfg, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.standard_normal(
        (cfg['b'], cfg['h'], cfg['w'], cfg['cin'])), dtype)
    k1 = jnp.asarray(rng.standard_normal(
        (3, 3, cfg['cin'], cfg['c1'])) * 0.05, dtype)
    b1 = jnp.asarray(rng.standard_normal((cfg['c1'],)) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (cfg['c1'],)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((cfg['c1'],)) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.standard_normal(
        (1, 1, cfg['c1'], cfg['nc'])) * 0.05, dtype)
    bp = jnp.asarray(rng.standard_normal((cfg['nc'],)) * 0.1, jnp.float32)
    return f, k1, b1, gamma, beta, wp, bp


def ref_seg(f, k1, b1, gamma, beta, wp, bp, r, rate=0.0, keep=None):
    """Literal composition with flax BN-train semantics, f32 stats."""
    up = upsample_like(f, (f.shape[1] * r, f.shape[2] * r))
    hidden = _conv(up, k1, None, hi=True) + b1.astype(up.dtype)
    xf = hidden.astype(jnp.float32)
    mean = xf.mean((0, 1, 2))
    var = (xf * xf).mean((0, 1, 2)) - mean * mean
    hn = (xf - mean) * gamma * lax.rsqrt(var + BN_EPS) + beta
    u = jax.nn.relu(hn)
    if keep is not None:
        u = jnp.where(keep, u / (1.0 - rate), 0.0)
    y = jnp.einsum('bhwc,cO->bhwO', u.astype(f.dtype),
                   wp.reshape(wp.shape[-2], wp.shape[-1]),
                   preferred_element_type=jnp.float32) + bp
    return y.astype(f.dtype), mean, var


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    s = max(np.abs(b).max(), 1e-6)
    return np.abs(a - b).max() / s


def check(name, cond, detail=''):
    status = 'OK ' if cond else 'FAIL'
    print(f'  [{status}] {name} {detail}')
    return bool(cond)


def main():
    print('backend:', jax.default_backend(), jax.devices())
    ok = True
    t0 = time.time()

    # ---- 1+2: seg kernel, production shape, no dropout: parity on chip
    cfg = PROD
    f, k1, b1, gamma, beta, wp, bp = make_args(cfg)
    out, m, v = jax.jit(lambda ff, kk, bb, gg, be: seg_head_fused_train(
        ff, kk, bb, gg, be, BN_EPS, wp, bp, scale=cfg['r']))(
        f, k1, b1, gamma, beta)
    ry, rm, rv = jax.jit(lambda *a: ref_seg(*a, wp, bp, cfg['r']))(
        f, k1, b1, gamma, beta)
    ok &= check('seg prod-shape forward parity (bf16)',
                rel_err(out, ry) < 0.05, f'rel={rel_err(out, ry):.2e}')
    ok &= check('seg prod-shape batch-mean parity',
                rel_err(m, rm) < 0.05, f'rel={rel_err(m, rm):.2e}')
    ok &= check('seg prod-shape batch-var parity',
                rel_err(v, rv) < 0.05, f'rel={rel_err(v, rv):.2e}')

    # ---- 3: counter-hash dropout mode — determinism + EXACT fwd/bwd
    # parity. The hash mask is a pure function of (seed, y, x, c) and is
    # XLA-computable, so both the forward AND the gradient of the fused
    # kernel can be compared against the literal composition drawing the
    # SAME mask — a deterministic check with no finite-difference noise.
    # (r4's fd-based check at 2% tolerance was dominated by ReLU-kink
    # crossings at t=1e-3 over 77k units; a real mask mismatch shows up
    # here as an O(1) gradient error, as the r4 hw-PRNG bug did at 46%.)
    cfg = SMALL
    f, k1, b1, gamma, beta, wp, bp = make_args(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(7)
    rate = 0.3
    seed_s = jnp.asarray([77], jnp.int32)

    def run(ff):
        y, _, _ = seg_head_fused_train(
            ff, k1, b1, gamma, beta, 1e-5, wp, bp, rate=rate, rng_key=key,
            scale=cfg['r'])
        return y

    j = jax.jit(run)
    y1, y2 = np.asarray(j(f)), np.asarray(j(f))
    ok &= check('seg hash-dropout determinism', np.array_equal(y1, y2))

    def run_seed(ff):
        y, _, _ = seg_head_fused_train(
            ff, k1, b1, gamma, beta, 1e-5, wp, bp, rate=rate, seed=seed_s,
            scale=cfg['r'])
        return y

    def ref_seed(ff):
        H, W = cfg['h'] * cfg['r'], cfg['w'] * cfg['r']
        keep = dropout_keep_mask((cfg['b'], H, W, cfg['c1']),
                                 seed_s[0], rate)
        y, _, _ = ref_seg(ff, k1, b1, gamma, beta, wp, bp, cfg['r'],
                          rate=rate, keep=keep)
        return y

    yk = jax.jit(run_seed)(f)
    yr = hi_jit(ref_seed)(f)
    ok &= check('seg hash-dropout forward parity (exact stream)',
                rel_err(yk, yr) < 1e-3, f'rel={rel_err(yk, yr):.2e}')

    # Precision-immune discriminator: the explicit-``mask`` mode runs the
    # IDENTICAL kernel code path with the mask computed by XLA's
    # dropout_keep_mask instead of in-kernel — bit-equality proves the
    # Mosaic-lowered hash equals the XLA hash, independent of any matmul
    # precision in a reference composition.
    def run_mask(ff):
        H, W = cfg['h'] * cfg['r'], cfg['w'] * cfg['r']
        keep = dropout_keep_mask((cfg['b'], H, W, cfg['c1']),
                                 seed_s[0], rate)
        y, _, _ = seg_head_fused_train(
            ff, k1, b1, gamma, beta, 1e-5, wp, bp, rate=rate, mask=keep,
            scale=cfg['r'])
        return y

    ym = jax.jit(run_mask)(f)
    ok &= check('seg in-kernel hash == XLA hash (fwd, bit-exact)',
                np.array_equal(np.asarray(yk), np.asarray(ym)),
                f'ndiff={int((np.asarray(yk) != np.asarray(ym)).sum())}')

    wsum = jnp.asarray(np.random.default_rng(3).standard_normal(y1.shape),
                       jnp.float32)
    gk = jax.jit(jax.grad(lambda ff: jnp.vdot(
        run_seed(ff).astype(jnp.float32), wsum)))(f)
    gm = jax.jit(jax.grad(lambda ff: jnp.vdot(
        run_mask(ff).astype(jnp.float32), wsum)))(f)
    # Not bit-exact: seed mode and mask mode lower to DIFFERENT backward
    # kernels (one regenerates the mask in-kernel, one consumes it as an
    # operand), so instruction scheduling differs and f32 sums land a few
    # ulp apart (observed ndiff=1068/65k at rel 2e-7 on chip). A wrong
    # mask flips whole units by O(1), so a 1e-6 rel bound still
    # discriminates mask regeneration exactly — and is precision-immune
    # (no reference composition involved at all).
    ok &= check('seg bwd regenerates fwd mask (grad, ulp-tight)',
                rel_err(gk, gm) < 1e-6,
                f'rel={rel_err(gk, gm):.2e} '
                f'ndiff={int((np.asarray(gk) != np.asarray(gm)).sum())}')
    gr = hi_jit(jax.grad(lambda ff: jnp.vdot(
        ref_seed(ff).astype(jnp.float32), wsum)))(f)
    ok &= check('seg fwd/bwd mask consistency (exact grad parity)',
                rel_err(gk, gr) < 2e-3, f'rel={rel_err(gk, gr):.2e}')

    # keep-rate: measure via the dropout's effect on the pre-proj hidden —
    # proxy: output of rate vs rate=0 with proj = identity-ish is complex;
    # instead count survivors through a positive-weight sum
    def survivors(kk):
        y, _, _ = seg_head_fused_train(
            jnp.abs(f) + 0.5, k1, b1, gamma, beta, 1e-5,
            jnp.abs(wp) + 0.01, bp * 0, rate=rate, rng_key=kk,
            scale=cfg['r'])
        return y
    # (sanity only: with all-positive hidden/proj, E[out] is rate-invariant
    #  iff the inverted-dropout scaling is correct)
    y_drop = float(jnp.mean(jax.jit(survivors)(key)))
    ynd, _, _ = jax.jit(lambda: seg_head_fused_train(
        jnp.abs(f) + 0.5, k1, b1, gamma, beta, 1e-5,
        jnp.abs(wp) + 0.01, bp * 0, scale=cfg['r']))()
    y_nd = float(jnp.mean(ynd))
    ok &= check('seg hw-PRNG inverted-dropout scaling',
                abs(y_drop - y_nd) < 0.05 * abs(y_nd),
                f'drop={y_drop:.4f} nodrop={y_nd:.4f}')

    # ---- 4: depth counter-hash mode — exact-stream parity on chip
    cfg = SMALL
    f, k1, b1, gamma, beta, _, _ = make_args(cfg, dtype=jnp.float32, seed=5)
    c2 = 64
    k2 = jnp.asarray(np.random.default_rng(6).standard_normal(
        (3, 3, cfg['c1'], c2)) * 0.05, jnp.float32)
    seed = jnp.asarray([1234], jnp.int32)
    h2, m1, v1 = jax.jit(lambda *a: depth_stage1_fused_train(
        *a, 1e-5, k2, rate=rate, seed=seed, scale=cfg['r']))(
        f, k1, b1, gamma, beta)

    def ref_depth():
        up = upsample_like(f, (f.shape[1] * cfg['r'], f.shape[2] * cfg['r']))
        hidden = _conv(up, k1) + b1
        xf = hidden.astype(jnp.float32)
        mean = xf.mean((0, 1, 2))
        var = (xf * xf).mean((0, 1, 2)) - mean * mean
        hn = (xf - mean) * gamma * lax.rsqrt(var + 1e-5) + beta
        u = jax.nn.relu(hn)
        keep = dropout_keep_mask(u.shape, seed[0], rate)
        u = jnp.where(keep, u / (1.0 - rate), 0.0)
        return _conv(u, k2), mean, var

    rh2, rm1, rv1 = hi_jit(ref_depth)()
    ok &= check('depth hash-dropout forward parity (exact stream)',
                rel_err(h2, rh2) < 1e-3, f'rel={rel_err(h2, rh2):.2e}')
    ok &= check('depth batch-mean parity', rel_err(m1, rm1) < 1e-3,
                f'rel={rel_err(m1, rm1):.2e}')
    ok &= check('depth batch-var parity', rel_err(v1, rv1) < 1e-3,
                f'rel={rel_err(v1, rv1):.2e}')

    # depth custom-VJP vs the literal composition's autodiff, same mask
    wsum_d = jnp.asarray(np.random.default_rng(8).standard_normal(h2.shape),
                         jnp.float32)
    gdk = jax.jit(jax.grad(lambda ff: jnp.vdot(depth_stage1_fused_train(
        ff, k1, b1, gamma, beta, 1e-5, k2, rate=rate, seed=seed,
        scale=cfg['r'])[0].astype(jnp.float32), wsum_d)))(f)

    def ref_depth_f(ff):
        up = upsample_like(ff, (ff.shape[1] * cfg['r'],
                                ff.shape[2] * cfg['r']))
        hidden = _conv(up, k1) + b1
        xf = hidden.astype(jnp.float32)
        mean = xf.mean((0, 1, 2))
        var = (xf * xf).mean((0, 1, 2)) - mean * mean
        hn = (xf - mean) * gamma * lax.rsqrt(var + 1e-5) + beta
        u = jax.nn.relu(hn)
        keep = dropout_keep_mask(u.shape, seed[0], rate)
        u = jnp.where(keep, u / (1.0 - rate), 0.0)
        return _conv(u, k2)

    gdr = hi_jit(jax.grad(lambda ff: jnp.vdot(
        ref_depth_f(ff).astype(jnp.float32), wsum_d)))(f)
    ok &= check('depth fwd/bwd mask consistency (exact grad parity)',
                rel_err(gdk, gdr) < 2e-3, f'rel={rel_err(gdk, gdr):.2e}')

    # hash keep-rate
    km = dropout_keep_mask((4, 64, 64, 128), jnp.int32(42), rate)
    kr = float(jnp.mean(km.astype(jnp.float32)))
    ok &= check('counter-hash keep rate', abs(kr - (1 - rate)) < 0.005,
                f'{kr:.4f} vs {1 - rate}')

    print(f'total {time.time() - t0:.0f}s ->', 'ALL OK' if ok else 'FAILURES')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
