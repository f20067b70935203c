"""Tests for ops/depthkernels_train.py — the train-mode fused depth-head
stage 1 (Pallas forward + custom-VJP backward, counter-hash dropout).

Kernels run in interpreter mode (CPU CI). The hash dropout mask is a pure
function of the global element index, so the kernel, the XLA border
strips, the backward recompute, and the literal reference composition all
draw the identical mask — forward, batch statistics, and gradients must
match the literal train composition to f32 rounding, including the
outer-two image-border lines that conv2's halo propagates inward.

Replaces the train path of reference model.py:16-78 in the trainer hot
loop (reference training/trainer.py:280-375).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from awsegbench.models.heads import BN_EPS
from awsegbench.ops.depthkernels_train import (
    depth_stage1_fused_train,
    dropout_keep_mask,
)
from awsegbench.ops.resize import upsample_like


def _conv(x, k, b=None):
    y = lax.conv_general_dilated(
        x, k, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        precision=lax.Precision.HIGHEST)
    return y if b is None else y + b


def _ref_stage1(f, k1, b1, gamma, beta, k2, r, rate=0.0, seed=0):
    """Literal composition with flax BN-train semantics and the hash
    dropout mask."""
    B, h, w, _ = f.shape
    H, W = h * r, w * r
    c1 = k1.shape[-1]
    up = upsample_like(f, (H, W))
    hidden = _conv(up, k1, b1)
    xf = hidden.astype(jnp.float32)
    mean = xf.mean((0, 1, 2))
    var = (xf * xf).mean((0, 1, 2)) - mean * mean
    u = jax.nn.relu((xf - mean) * gamma * lax.rsqrt(var + BN_EPS) + beta)
    if rate > 0.0:
        keepm = dropout_keep_mask((B, H, W, c1), jnp.int32(seed), rate)
        u = jnp.where(keepm, u / (1.0 - rate), 0.0)
    h2 = _conv(u, k2)
    return h2, mean, var


def _make_args(rng, h, w, cin, c1, c2):
    f = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, cin, c1)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (c1,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, c1, c2)) * 0.2, jnp.float32)
    return f, k1, b1, gamma, beta, k2


def test_mask_deterministic_and_keep_rate():
    m1 = dropout_keep_mask((2, 64, 64, 16), jnp.int32(7), 0.3)
    m2 = dropout_keep_mask((2, 64, 64, 16), jnp.int32(7), 0.3)
    m3 = dropout_keep_mask((2, 64, 64, 16), jnp.int32(8), 0.3)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert np.asarray(m1 != m3).mean() > 0.1          # seed-sensitive
    assert abs(float(jnp.mean(m1)) - 0.7) < 0.01      # keep rate


@pytest.mark.parametrize('h,w,cin,c1,c2,r', [
    (3, 4, 8, 16, 12, 8),
    (2, 2, 4, 8, 6, 4),    # output is 100% border frame
])
def test_forward_and_stats_match_composition(h, w, cin, c1, c2, r):
    rng = np.random.default_rng(0)
    f, k1, b1, gamma, beta, k2 = _make_args(rng, h, w, cin, c1, c2)
    ref_h2, ref_m, ref_v = _ref_stage1(f, k1, b1, gamma, beta, k2, r)
    got_h2, got_m, got_v = depth_stage1_fused_train(
        f, k1, b1, gamma, beta, BN_EPS, k2, scale=r, interpret=True)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_h2), np.asarray(ref_h2),
                               rtol=1e-4, atol=1e-4)


def test_forward_dropout_parity():
    h, w, cin, c1, c2, r, rate, seed = 3, 4, 8, 16, 12, 8, 0.3, 11
    rng = np.random.default_rng(1)
    f, k1, b1, gamma, beta, k2 = _make_args(rng, h, w, cin, c1, c2)
    ref_h2, _, _ = _ref_stage1(f, k1, b1, gamma, beta, k2, r, rate, seed)
    got_h2, _, _ = depth_stage1_fused_train(
        f, k1, b1, gamma, beta, BN_EPS, k2, rate=rate, seed=seed,
        scale=r, interpret=True)
    np.testing.assert_allclose(np.asarray(got_h2), np.asarray(ref_h2),
                               rtol=1e-4, atol=1e-4)


def test_backward_grad_parity():
    """Gradients through the FULL depth-head train composition (stage 1
    fused + XLA BN2/ReLU/proj/sigmoid tail) vs the literal path, with
    dropout — exercises dpp/da1/dc1/dw2 and both BN batch-stat
    couplings."""
    h, w, cin, c1, c2, r, rate, seed = 3, 4, 8, 16, 12, 8, 0.3, 13
    rng = np.random.default_rng(2)
    f, k1, b1, gamma, beta, k2 = _make_args(rng, h, w, cin, c1, c2)
    b2 = jnp.asarray(rng.standard_normal((c2,)) * 0.1, jnp.float32)
    g2 = jnp.asarray(rng.uniform(0.5, 1.5, (c2,)), jnp.float32)
    be2 = jnp.asarray(rng.standard_normal((c2,)) * 0.1, jnp.float32)
    kp = jnp.asarray(rng.standard_normal((1, 1, c2, 1)) * 0.3, jnp.float32)
    bp = jnp.asarray(rng.standard_normal((1,)) * 0.1, jnp.float32)
    wsum = jnp.asarray(rng.standard_normal((2, h * r, w * r, 1)),
                       jnp.float32)

    def tail(h2):
        xf = (h2 + b2).astype(jnp.float32)
        m2 = xf.mean((0, 1, 2))
        v2 = (xf * xf).mean((0, 1, 2)) - m2 * m2
        u2 = jax.nn.relu((xf - m2) * g2 * lax.rsqrt(v2 + BN_EPS) + be2)
        return jax.nn.sigmoid(_conv(u2, kp, bp))

    def loss_ref(a):
        f, k1, b1, gamma, beta, k2 = a
        h2, _, _ = _ref_stage1(f, k1, b1, gamma, beta, k2, r, rate, seed)
        return jnp.sum(tail(h2) * wsum)

    def loss_fused(a):
        f, k1, b1, gamma, beta, k2 = a
        h2, _, _ = depth_stage1_fused_train(
            f, k1, b1, gamma, beta, BN_EPS, k2, rate=rate, seed=seed,
            scale=r, interpret=True)
        return jnp.sum(tail(h2) * wsum)

    args = (f, k1, b1, gamma, beta, k2)
    g_ref = jax.grad(loss_ref)(args)
    g_fused = jax.grad(loss_fused)(args)
    names = ['f', 'k1', 'b1', 'gamma', 'beta', 'k2']
    for name, a, b in zip(names, g_ref, g_fused):
        scale = float(jnp.abs(a).max())
        if name == 'b1':
            # analytically zero: BN1's batch-mean subtraction cancels the
            # conv1 bias; both paths produce only rounding noise
            assert scale < 1e-3
            continue
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3,
            atol=max(scale, 1.0) * 3e-5, err_msg=f'grad {name}')


def test_bf16_tolerance():
    """Production feeds bf16 activations; pin the bf16 rounding path
    against the f32 composition."""
    h, w, cin, c1, c2, r = 3, 4, 8, 16, 12, 8
    rng = np.random.default_rng(3)
    f, k1, b1, gamma, beta, k2 = _make_args(rng, h, w, cin, c1, c2)
    ref_h2, ref_m, ref_v = _ref_stage1(f, k1, b1, gamma, beta, k2, r)
    got_h2, got_m, got_v = depth_stage1_fused_train(
        f.astype(jnp.bfloat16), k1.astype(jnp.bfloat16), b1, gamma, beta,
        BN_EPS, k2.astype(jnp.bfloat16), scale=r, interpret=True)
    scale = float(jnp.abs(ref_h2).max())
    assert float(jnp.abs(got_h2.astype(jnp.float32) - ref_h2).max()) \
        < 0.05 * scale
    assert float(jnp.abs(got_m - ref_m).max()) < 0.05
    assert float(jnp.abs(got_v - ref_v).max()) < 0.1


def test_rng_key_and_seed_agree():
    """rng_key seeding is just a derived int32 seed — same mask pathway."""
    h, w, cin, c1, c2, r, rate = 2, 2, 4, 8, 6, 4, 0.5
    rng = np.random.default_rng(4)
    f, k1, b1, gamma, beta, k2 = _make_args(rng, h, w, cin, c1, c2)
    key = jax.random.PRNGKey(3)
    seed = int(np.asarray(lax.bitcast_convert_type(
        jax.random.bits(key, (1,), jnp.uint32), jnp.int32))[0])
    a, _, _ = depth_stage1_fused_train(
        f, k1, b1, gamma, beta, BN_EPS, k2, rate=rate, rng_key=key,
        scale=r, interpret=True)
    b, _, _ = depth_stage1_fused_train(
        f, k1, b1, gamma, beta, BN_EPS, k2, rate=rate, seed=seed,
        scale=r, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
