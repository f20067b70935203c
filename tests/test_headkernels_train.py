"""Tests for ops/headkernels_train.py — the train-mode fused seg head
(Pallas forward + custom-VJP backward + coarse-domain batch statistics).

Kernels run in interpreter mode here (CPU CI) with the explicit-``mask``
dropout path (the hardware-PRNG stream only lowers on real TPUs); the
math must equal the literal train composition — conv3×3(upsample) →
BN(batch stats) → ReLU → dropout → conv1×1 — to f32 rounding, including
all image borders, for the forward, the batch statistics, AND the
gradients of every parameter.

Replaces the train-path capability of reference model.py:152-158 inside
the trainer hot loop (trainer.py:280-375).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from awsegbench.models.heads import BN_EPS, BatchNormParams
from awsegbench.ops.headkernels_train import seg_head_fused_train
from awsegbench.ops.resize import upsample_like


def _conv(x, k, b=None):
    y = lax.conv_general_dilated(
        x, k, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        precision=lax.Precision.HIGHEST)
    return y if b is None else y + b


def _ref_train_head(f, k1, b1, gamma, beta, wp, bp, r,
                    rate=0.0, mask=None):
    """Literal composition with flax BN-train semantics (f32 fast-variance
    batch stats over all pixels)."""
    up = upsample_like(f, (f.shape[1] * r, f.shape[2] * r))
    hidden = _conv(up, k1, b1)
    xf = hidden.astype(jnp.float32)
    mean = xf.mean((0, 1, 2))
    var = (xf * xf).mean((0, 1, 2)) - mean * mean
    hn = (xf - mean) * gamma * lax.rsqrt(var + BN_EPS) + beta
    u = jax.nn.relu(hn)
    if rate > 0.0:
        u = jnp.where(mask, u / (1.0 - rate), 0.0)
    c1, nc = wp.shape[-2], wp.shape[-1]
    y = jnp.einsum('bhwc,cO->bhwO', u, wp.reshape(c1, nc),
                   precision=lax.Precision.HIGHEST) + bp
    return y, mean, var


def _make_args(rng, h, w, cin, c1, nc):
    f = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, cin, c1)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (c1,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((1, 1, c1, nc)) * 0.2, jnp.float32)
    bp = jnp.asarray(rng.standard_normal((nc,)) * 0.1, jnp.float32)
    return f, k1, b1, gamma, beta, wp, bp


@pytest.mark.parametrize('h,w,cin,c1,nc,r', [
    (3, 4, 8, 16, 7, 8),
    (2, 2, 4, 8, 3, 4),    # every tile is a border tile
])
def test_train_forward_and_stats_match_composition(h, w, cin, c1, nc, r):
    rng = np.random.default_rng(0)
    f, k1, b1, gamma, beta, wp, bp = _make_args(rng, h, w, cin, c1, nc)
    ref_y, ref_m, ref_v = _ref_train_head(f, k1, b1, gamma, beta, wp, bp, r)
    got_y, got_m, got_v = seg_head_fused_train(
        f, k1, b1, gamma, beta, BN_EPS, wp, bp, scale=r, interpret=True)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               rtol=1e-4, atol=1e-4)


def test_train_forward_dropout_mask_parity():
    h, w, cin, c1, nc, r, rate = 3, 4, 8, 16, 7, 8, 0.3
    rng = np.random.default_rng(1)
    f, k1, b1, gamma, beta, wp, bp = _make_args(rng, h, w, cin, c1, nc)
    mask = jnp.asarray(rng.random((2, h * r, w * r, c1)) > rate)
    ref_y, _, _ = _ref_train_head(f, k1, b1, gamma, beta, wp, bp, r,
                                  rate, mask)
    got_y, _, _ = seg_head_fused_train(
        f, k1, b1, gamma, beta, BN_EPS, wp, bp, rate=rate, mask=mask,
        scale=r, interpret=True)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               rtol=1e-4, atol=1e-4)


def test_train_backward_grad_parity():
    """Gradients of every differentiable input vs jax.grad through the
    literal composition (batch-stat coupling included), with dropout."""
    h, w, cin, c1, nc, r, rate = 3, 4, 8, 16, 7, 8, 0.3
    rng = np.random.default_rng(2)
    args = _make_args(rng, h, w, cin, c1, nc)
    mask = jnp.asarray(rng.random((2, h * r, w * r, c1)) > rate)
    wsum = jnp.asarray(rng.standard_normal((2, h * r, w * r, nc)),
                       jnp.float32)

    def loss_ref(a):
        y, _, _ = _ref_train_head(*a, r, rate, mask)
        return jnp.sum(y * wsum)

    def loss_fused(a):
        f, k1, b1, gamma, beta, wp, bp = a
        y, _, _ = seg_head_fused_train(
            f, k1, b1, gamma, beta, BN_EPS, wp, bp, rate=rate, mask=mask,
            scale=r, interpret=True)
        return jnp.sum(y * wsum)

    g_ref = jax.grad(loss_ref)(args)
    g_fused = jax.grad(loss_fused)(args)
    names = ['f', 'k1', 'b1', 'gamma', 'beta', 'wp', 'bp']
    for name, a, b in zip(names, g_ref, g_fused):
        scale = float(jnp.abs(a).max())
        if name == 'b1':
            # analytically zero: BN batch-mean subtraction cancels the
            # conv bias exactly; both paths produce only rounding noise
            assert scale < 1e-3
            continue
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3,
            atol=max(scale, 1.0) * 2e-5, err_msg=f'grad {name}')


def test_train_kernel_bf16_tolerance():
    """Production feeds bf16 activations; pin the bf16 rounding path
    against the f32 composition."""
    h, w, cin, c1, nc, r = 3, 4, 8, 16, 7, 8
    rng = np.random.default_rng(3)
    f, k1, b1, gamma, beta, wp, bp = _make_args(rng, h, w, cin, c1, nc)
    ref_y, ref_m, ref_v = _ref_train_head(f, k1, b1, gamma, beta, wp, bp, r)
    got_y, got_m, got_v = seg_head_fused_train(
        f.astype(jnp.bfloat16), k1.astype(jnp.bfloat16), b1,
        gamma, beta, BN_EPS, wp.astype(jnp.bfloat16), bp,
        scale=r, interpret=True)
    scale = float(jnp.abs(ref_y).max())
    assert float(jnp.abs(got_y.astype(jnp.float32) - ref_y).max()) \
        < 0.05 * scale
    # stats are f32 contractions of the bf16 partial products
    assert float(jnp.abs(got_m - ref_m).max()) < 0.05
    assert float(jnp.abs(got_v - ref_v).max()) < 0.1


def test_grad_mixed_dtypes():
    """bf16 kernels + f32 biases (the production dtype mix): the custom
    VJP must return cotangents matching each primal's own dtype."""
    h, w, cin, c1, nc, r = 3, 4, 8, 16, 7, 8
    rng = np.random.default_rng(6)
    f, k1, b1, gamma, beta, wp, bp = _make_args(rng, h, w, cin, c1, nc)
    f16, k16, w16 = (a.astype(jnp.bfloat16) for a in (f, k1, wp))

    def loss(args):
        ff, kk, ww, bb = args
        y, _, _ = seg_head_fused_train(
            ff, kk, b1, gamma, beta, BN_EPS, ww, bb, scale=r,
            interpret=True)
        return jnp.sum(y.astype(jnp.float32))

    g = jax.grad(loss)((f16, k16, w16, bp))
    for a, prim in zip(g, (f16, k16, w16, bp)):
        assert a.dtype == prim.dtype
    assert all(bool(jnp.all(jnp.isfinite(a.astype(jnp.float32))))
               for a in g)


def test_batchnorm_set_stats_folds_like_train_branch():
    """BatchNormParams(set_stats=...) must update running stats exactly as
    the module's own train branch does for the same batch statistics."""
    c = 6
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 5, 5, c)), jnp.float32)
    xf = x.astype(jnp.float32)
    mean = xf.mean((0, 1, 2))
    var = (xf * xf).mean((0, 1, 2)) - mean * mean

    bn = BatchNormParams()
    v0 = bn.init(jax.random.PRNGKey(0), x, train=False)
    # train-branch update
    _, upd_a = bn.apply(v0, x, train=True, mutable=['batch_stats'])
    # set_stats update with externally computed identical statistics
    _, upd_b = bn.apply(v0, None, features=c, set_stats=(mean, var),
                        mutable=['batch_stats'])
    for k in ('mean', 'var'):
        np.testing.assert_allclose(
            np.asarray(upd_b['batch_stats'][k]),
            np.asarray(upd_a['batch_stats'][k]), rtol=1e-6, atol=1e-6)


def test_grad_b1_zero_by_construction():
    """The fused path routes conv1_bias only into the returned mean, so
    its output-gradient is exactly zero (the analytic value)."""
    h, w, cin, c1, nc, r = 2, 2, 4, 8, 3, 4
    rng = np.random.default_rng(5)
    f, k1, b1, gamma, beta, wp, bp = _make_args(rng, h, w, cin, c1, nc)

    def loss(b1):
        y, _, _ = seg_head_fused_train(
            f, k1, b1, gamma, beta, BN_EPS, wp, bp, scale=r,
            interpret=True)
        return jnp.sum(y)

    g = jax.grad(loss)(b1)
    np.testing.assert_array_equal(np.asarray(g), np.zeros_like(g))
