"""Tests for ops/headkernels.py (fused Pallas head pipelines) and the
nn.BatchNorm-compatible holder the heads use to share parameters between
the flax path and the kernel path.

Kernels run in interpreter mode here (CPU CI); the math must equal the
literal composition to f32 rounding, including all image borders.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from awsegbench.models.heads import BatchNormParams
from awsegbench.ops.headkernels import seg_head_fused
from awsegbench.ops.resize import upsample_like


def _conv(x, k, b=None):
    y = lax.conv_general_dilated(
        x, k, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y if b is None else y + b


def _bn(x, s, o, m, v, eps=1e-5):
    return (x - m) / jnp.sqrt(v + eps) * s + o


def _rand_bn(rng, c):
    return (jnp.asarray(rng.uniform(0.5, 1.5, (c,)), jnp.float32),
            jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
            jnp.asarray(rng.uniform(0.5, 2.0, (c,)), jnp.float32))


@pytest.mark.parametrize('h,w,cin,c1,nc,r', [
    (3, 4, 8, 16, 7, 8),
    (2, 2, 4, 8, 3, 4),    # every tile is a border tile
    (1, 5, 8, 8, 19, 8),   # single coarse row
])
def test_seg_kernel_matches_composition(h, w, cin, c1, nc, r):
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, cin, c1)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32)
    bs, bo, bm, bv = _rand_bn(rng, c1)
    kp = jnp.asarray(rng.standard_normal((1, 1, c1, nc)) * 0.2, jnp.float32)
    bp = jnp.asarray(rng.standard_normal((nc,)) * 0.1, jnp.float32)

    up = upsample_like(f, (h * r, w * r))
    ref = _conv(jnp.maximum(_bn(_conv(up, k1, b1), bs, bo, bm, bv), 0.0),
                kp, bp)
    got = seg_head_fused(f, k1, b1, bs, bo, bm, bv, 1e-5, kp, bp,
                         scale=r, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_seg_kernel_bf16_tolerance():
    """Production runs the kernel in bf16 (mm_dtype follows the input);
    pin the bf16 rounding path against the f32 composition."""
    rng = np.random.default_rng(5)
    h, w, cin, c1, nc, r = 3, 4, 8, 16, 7, 8
    f32 = [jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32),
           jnp.asarray(rng.standard_normal((3, 3, cin, c1)) * 0.2,
                       jnp.float32),
           jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32)]
    bs, bo, bm, bv = _rand_bn(rng, c1)
    kp = jnp.asarray(rng.standard_normal((1, 1, c1, nc)) * 0.2, jnp.float32)
    bp = jnp.asarray(rng.standard_normal((nc,)) * 0.1, jnp.float32)
    f, k1, b1 = f32

    up = upsample_like(f, (h * r, w * r))
    ref = np.asarray(_conv(
        jnp.maximum(_bn(_conv(up, k1, b1), bs, bo, bm, bv), 0.0), kp, bp))
    got = seg_head_fused(f.astype(jnp.bfloat16),
                         k1.astype(jnp.bfloat16), b1, bs, bo, bm, bv, 1e-5,
                         kp.astype(jnp.bfloat16), bp,
                         scale=r, interpret=True)
    np.testing.assert_allclose(np.asarray(got.astype(jnp.float32)), ref,
                               rtol=6e-2, atol=6e-2)


class TestBatchNormParams:
    """The manual BN holder must be variable- and numerics-compatible with
    nn.BatchNorm(momentum=.9, epsilon=1e-5)."""

    def _pair(self, x, train):
        ref_mod = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5)
        my_mod = BatchNormParams()
        vref = ref_mod.init(jax.random.PRNGKey(0), x)
        vmy = my_mod.init(jax.random.PRNGKey(0), x, train)
        return ref_mod, my_mod, vref, vmy

    def test_variable_layout(self):
        x = jnp.ones((2, 4, 4, 6))
        _, _, vref, vmy = self._pair(x, False)
        assert (jax.tree_util.tree_structure(vref)
                == jax.tree_util.tree_structure(vmy))
        for a, b in zip(jax.tree_util.tree_leaves(vref),
                        jax.tree_util.tree_leaves(vmy)):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_eval_matches_nn_batchnorm(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 4, 4, 6)), jnp.float32)
        ref_mod, my_mod, vref, _ = self._pair(x, False)
        # use shared non-trivial stats
        stats = {'mean': jnp.asarray(rng.standard_normal(6), jnp.float32),
                 'var': jnp.asarray(rng.uniform(0.5, 2.0, 6), jnp.float32)}
        params = {'scale': jnp.asarray(rng.uniform(0.5, 1.5, 6), jnp.float32),
                  'bias': jnp.asarray(rng.standard_normal(6), jnp.float32)}
        v = {'params': params, 'batch_stats': stats}
        out_ref = ref_mod.apply(v, x)
        out_my = my_mod.apply(v, x, False)
        np.testing.assert_allclose(np.asarray(out_my), np.asarray(out_ref),
                                   rtol=1e-6, atol=1e-6)

    def test_train_matches_nn_batchnorm(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 4, 4, 6)), jnp.float32)
        ref_mod, my_mod, vref, vmy = self._pair(x, True)
        out_ref, mref = ref_mod.apply(vref, x, mutable=['batch_stats'])
        out_my, mmy = my_mod.apply(vref, x, True, mutable=['batch_stats'])
        np.testing.assert_allclose(np.asarray(out_my), np.asarray(out_ref),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(mref),
                        jax.tree_util.tree_leaves(mmy)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)
