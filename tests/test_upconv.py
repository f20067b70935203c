"""Tests for ops/upconv.py — the fused bilinear-upsample + conv3×3 op.

The op must be numerically equivalent (mod float reassociation) to the
literal composition the reference computes: bilinearly upsample features to
full resolution, then a SAME-padded 3×3 conv (reference model.py:209-214).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from awsegbench.models import init_model
from awsegbench.models.heads import DepthEstimationHead, SegmentationHead
from awsegbench.models.segformer import SegFormerModel
from awsegbench.ops.resize import upsample_like
from awsegbench.ops.upconv import _upsample1d, upsample_conv3x3


def _literal(f, k, bias, r):
    h, w = f.shape[1], f.shape[2]
    up = upsample_like(f, (h * r, w * r))
    out = lax.conv_general_dilated(
        up, k, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out + bias


@pytest.mark.parametrize('h,w,cin,cout,r', [
    (4, 5, 7, 11, 4),      # odd channels, small scale
    (3, 6, 8, 16, 8),
    (2, 4, 16, 8, 32),     # production scale factor
    (16, 32, 12, 10, 32),  # stage-4 spatial dims at 512x1024
    (1, 1, 4, 4, 4),       # degenerate single coarse pixel
    (5, 2, 3, 6, 16),
])
def test_matches_literal_composition_f32(h, w, cin, cout, r):
    rng = np.random.default_rng(42)
    f = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    ref = _literal(f, k, bias, r)
    got = upsample_conv3x3(f, k, bias, scale=r)
    assert got.shape == (2, h * r, w * r, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_matches_literal_bf16():
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((1, 4, 6, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 32, 16)) * 0.1, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((16,)), jnp.bfloat16)
    ref = np.asarray(_literal(f, k, bias, 8).astype(jnp.float32))
    got = np.asarray(upsample_conv3x3(f, k, bias, scale=8).astype(jnp.float32))
    # bf16 has ~3 decimal digits; the reassociated sum stays within a few ulp
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)


def test_no_bias_and_scale_validation():
    f = jnp.ones((1, 2, 2, 3), jnp.float32)
    k = jnp.ones((3, 3, 3, 4), jnp.float32)
    out = upsample_conv3x3(f, k, None, scale=4)
    assert out.shape == (1, 8, 8, 4)
    with pytest.raises(ValueError):
        upsample_conv3x3(f, k, None, scale=2)
    with pytest.raises(ValueError):
        upsample_conv3x3(f, jnp.ones((5, 5, 3, 4)), None, scale=4)


def test_upsample1d_matches_resize():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 7, 5)), jnp.float32)
    for r in (4, 8, 32):
        got = _upsample1d(x, r, 1)
        ref = jax.image.resize(x, (2, 7 * r, 5), 'linear')
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('head_cls,kwargs', [
    (SegmentationHead, {'num_classes': 7}),
    (DepthEstimationHead, {'hidden_channels': 16}),
])
def test_head_fused_path_matches_plain(head_cls, kwargs):
    """Same head params drive both paths; outputs must agree."""
    rng = np.random.default_rng(3)
    head = head_cls(**kwargs)
    coarse = jnp.asarray(rng.standard_normal((2, 3, 4, 8)), jnp.float32)
    r = 8
    full = upsample_like(coarse, (3 * r, 4 * r))
    variables = head.init(jax.random.PRNGKey(0), full, False)
    plain = head.apply(variables, full, False)
    fused = head.apply(variables, coarse, False, upsample_scale=r)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=1e-4, atol=1e-5)


def test_head_param_tree_matches_nn_conv_layout():
    """The Conv_0 holder must be variable-compatible with nn.Conv
    (checkpoints / converters / pretrained grafting rely on the layout)."""
    head = SegmentationHead(num_classes=5, hidden_channels=12)
    v = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 6)), False)
    p = v['params']
    assert set(p.keys()) >= {'Conv_0', 'Conv_1'}
    assert p['Conv_0']['kernel'].shape == (3, 3, 6, 12)
    assert p['Conv_0']['bias'].shape == (12,)
    assert p['Conv_1']['kernel'].shape == (1, 1, 12, 5)


def test_segformer_fused_vs_literal_model_level():
    """Full SegFormer faithful path: fused_upsample on/off, same variables."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 128, 3)), jnp.float32)
    lit = SegFormerModel(num_classes=19, include_depth=True,
                         fused_upsample=False)
    fus = SegFormerModel(num_classes=19, include_depth=True,
                         fused_upsample=True)
    v = init_model(lit, jax.random.PRNGKey(0), (1, 64, 128, 3))
    v2 = init_model(fus, jax.random.PRNGKey(0), (1, 64, 128, 3))
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    o1 = lit.apply(v, x, train=False)
    o2 = fus.apply(v, x, train=False)
    for key in o1:
        np.testing.assert_allclose(np.asarray(o1[key]), np.asarray(o2[key]),
                                   rtol=1e-4, atol=1e-4)


def test_segformer_fused_falls_back_on_nonmultiple_input():
    """Inputs whose size isn't an integer multiple of the stage-4 grid must
    silently use the literal path (shape-driven, trace-time decision)."""
    rng = np.random.default_rng(0)
    # 72 = 32*2 + 8 → stage-4 grid ceil(72/32)=3, 72 != 3*24... exercises
    # the fallback guard (h % fh != 0 or unequal per-axis scales)
    x = jnp.asarray(rng.standard_normal((1, 72, 128, 3)), jnp.float32)
    fus = SegFormerModel(num_classes=19, include_depth=False,
                         fused_upsample=True)
    v = init_model(fus, jax.random.PRNGKey(0), (1, 72, 128, 3))
    out = fus.apply(v, x, train=False)
    assert out['segmentation'].shape == (1, 72, 128, 19)


def test_fused_train_mode_gradients_flow():
    """Dropout/BN train-mode path works and grads reach Conv_0 params."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    m = SegFormerModel(num_classes=5, include_depth=False,
                       fused_upsample=True)
    v = init_model(m, jax.random.PRNGKey(0), (1, 64, 64, 3))

    def loss(params):
        out, _ = m.apply({'params': params,
                          'batch_stats': v.get('batch_stats', {})},
                         x, train=True, mutable=['batch_stats'],
                         rngs={'dropout': jax.random.PRNGKey(1)})
        return jnp.mean(out['segmentation'] ** 2)

    g = jax.grad(loss)(v['params'])
    g_conv0 = g['SegmentationHead_0']['Conv_0']['kernel']
    assert float(jnp.max(jnp.abs(g_conv0))) > 0
