"""Model tests — coverage map mirrors reference tests/test_model.py:
head shapes/ranges, each model's forward shapes with/without depth,
ensemble strategies and output keys, disagreement non-negativity,
temperature parameter existence, gradient flow, save/load round trip.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awsegbench.models import (DeepLabV3PlusModel, DepthEstimationHead,
                               EnsembleModel, SegFormerModel,
                               count_parameters, create_model, init_model)
from awsegbench.utils.config import Config

RNG = jax.random.PRNGKey(0)
H, W = 64, 128


def _tiny_deeplab(**kw):
    return DeepLabV3PlusModel(encoder_layers=(1, 1, 1, 1),
                              encoder_widths=(16, 24, 32, 48), **kw)


def _tiny_segformer(**kw):
    # hidden sizes divisible by the B0 head counts (1, 2, 5, 8)
    return SegFormerModel(hidden_sizes=(8, 16, 20, 32),
                          depths=(1, 1, 1, 1), **kw)


class TestDepthHead:
    def test_shape_and_range(self):
        head = DepthEstimationHead(hidden_channels=32)
        feats = jnp.zeros((2, 16, 16, 24))
        variables = head.init(RNG, feats, train=False)
        out = head.apply(variables, feats, train=False)
        assert out.shape == (2, 16, 16, 1)
        x = jax.random.normal(RNG, (2, 16, 16, 24))
        out = head.apply(variables, x, train=False)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class TestSegFormer:
    @pytest.mark.parametrize('include_depth', [True, False])
    def test_forward_shapes(self, include_depth):
        m = _tiny_segformer(num_classes=5, include_depth=include_depth)
        variables = init_model(m, RNG, (2, H, W, 3))
        out = m.apply(variables, jnp.zeros((2, H, W, 3)), train=False)
        assert out['segmentation'].shape == (2, H, W, 5)
        assert ('depth' in out) == include_depth
        if include_depth:
            assert out['depth'].shape == (2, H, W, 1)

    def test_fused_head_mode_shape(self):
        m = _tiny_segformer(num_classes=5, head_mode='fused')
        variables = init_model(m, RNG, (1, H, W, 3))
        out = m.apply(variables, jnp.zeros((1, H, W, 3)), train=False)
        assert out['segmentation'].shape == (1, H, W, 5)


class TestDeepLab:
    @pytest.mark.parametrize('include_depth', [True, False])
    def test_forward_shapes(self, include_depth):
        m = _tiny_deeplab(num_classes=5, include_depth=include_depth)
        variables = init_model(m, RNG, (2, H, W, 3))
        out = m.apply(variables, jnp.zeros((2, H, W, 3)), train=False)
        assert out['segmentation'].shape == (2, H, W, 5)
        assert ('depth' in out) == include_depth

    def test_full_resnet50_param_count(self):
        """Full ResNet-50 encoder ≈ 23.5M params (torchvision resnet50 minus
        fc = 23.5M) — sanity that the architecture matches."""
        m = DeepLabV3PlusModel(num_classes=19, include_depth=False)
        variables = init_model(m, RNG, (1, 64, 64, 3))
        n = count_parameters(variables['params'])
        assert 25_000_000 < n < 32_000_000


class TestEnsemble:
    def _tiny_ensemble(self, **kw):
        class TinyEnsemble(EnsembleModel):
            def setup(self):
                self.segformer = _tiny_segformer(
                    num_classes=self.num_classes,
                    include_depth=self.include_depth)
                self.deeplabv3plus = _tiny_deeplab(
                    num_classes=self.num_classes,
                    include_depth=self.include_depth)
                self.ensemble_weights = self.param(
                    'ensemble_weights',
                    lambda _: jnp.ones((2,), jnp.float32) / 2)
                if self.temperature_scaling:
                    self.temperature = self.param(
                        'temperature', lambda _: jnp.ones((1,), jnp.float32))
        return TinyEnsemble(num_classes=5, **kw)

    @pytest.mark.parametrize('strategy',
                             ['weighted_average', 'max_confidence', 'average'])
    def test_strategies_and_keys(self, strategy):
        m = self._tiny_ensemble(ensemble_strategy=strategy)
        variables = init_model(m, RNG, (1, H, W, 3))
        out = m.apply(variables, jnp.zeros((1, H, W, 3)), train=False)
        for key in ('segmentation', 'segformer_seg', 'deeplabv3plus_seg',
                    'depth', 'segformer_depth', 'deeplabv3plus_depth'):
            assert key in out, key
        assert out['segmentation'].shape == (1, H, W, 5)

    def test_temperature_param_exists(self):
        m = self._tiny_ensemble(temperature_scaling=True)
        variables = init_model(m, RNG, (1, H, W, 3))
        assert 'temperature' in variables['params']
        assert 'ensemble_weights' in variables['params']
        assert variables['params']['ensemble_weights'].shape == (2,)

    def test_disagreement_nonneg(self):
        m = self._tiny_ensemble()
        variables = init_model(m, RNG, (1, H, W, 3))
        x = jax.random.normal(RNG, (1, H, W, 3))
        dis = m.apply(variables, x, method='get_ensemble_disagreement')
        assert dis.shape == (1, H, W)
        assert float(dis.min()) >= -1e-5

    def test_weighted_average_math(self):
        """softmax(w) mixes logits BEFORE the temperature division
        (model.py:443-446, :461-462)."""
        m = self._tiny_ensemble(ensemble_strategy='weighted_average',
                                temperature_scaling=True)
        variables = init_model(m, RNG, (1, H, W, 3))
        p = flax.core.unfreeze(variables['params'])
        p['ensemble_weights'] = jnp.asarray([1.0, -1.0])
        p['temperature'] = jnp.asarray([2.0])
        variables = {**variables, 'params': p}
        x = jax.random.normal(RNG, (1, H, W, 3))
        out = m.apply(variables, x, train=False)
        w = jax.nn.softmax(jnp.asarray([1.0, -1.0]))
        expected = (w[0] * out['segformer_seg'] +
                    w[1] * out['deeplabv3plus_seg']) / 2.0
        assert np.allclose(np.asarray(out['segmentation']),
                           np.asarray(expected), atol=1e-5)


class TestTraining:
    def test_gradient_flow(self):
        m = _tiny_segformer(num_classes=5)
        variables = init_model(m, RNG, (1, H, W, 3))
        x = jax.random.normal(RNG, (1, H, W, 3))

        def loss_fn(params):
            out, _ = m.apply({'params': params,
                              'batch_stats': variables['batch_stats']},
                             x, train=True,
                             rngs={'dropout': jax.random.PRNGKey(1)},
                             mutable=['batch_stats'])
            return jnp.mean(out['segmentation'] ** 2)

        grads = jax.grad(loss_fn)(variables['params'])
        norms = [float(jnp.abs(g).sum())
                 for g in jax.tree_util.tree_leaves(grads)]
        assert sum(n > 0 for n in norms) > len(norms) * 0.5

    def test_state_dict_roundtrip(self):
        m = _tiny_deeplab(num_classes=5)
        variables = init_model(m, RNG, (1, H, W, 3))
        raw = flax.serialization.to_bytes(variables)
        restored = flax.serialization.from_bytes(variables, raw)
        for a, b in zip(jax.tree_util.tree_leaves(variables),
                        jax.tree_util.tree_leaves(restored)):
            assert np.allclose(np.asarray(a), np.asarray(b))

    def test_train_eval_mode_differ(self):
        """Dropout + BN batch stats make train-mode output differ."""
        m = _tiny_deeplab(num_classes=5)
        variables = init_model(m, RNG, (2, H, W, 3))
        x = jax.random.normal(RNG, (2, H, W, 3))
        out_eval = m.apply(variables, x, train=False)
        out_train, _ = m.apply(variables, x, train=True,
                               rngs={'dropout': jax.random.PRNGKey(2)},
                               mutable=['batch_stats'])
        assert not np.allclose(np.asarray(out_eval['segmentation']),
                               np.asarray(out_train['segmentation']))


class TestFactory:
    @pytest.mark.parametrize('mtype,cls', [
        ('segformer', SegFormerModel),
        ('deeplabv3plus', DeepLabV3PlusModel),
        ('ensemble', EnsembleModel),
    ])
    def test_create_model(self, mtype, cls):
        cfg = Config({'model': {'type': mtype, 'num_classes': 7}})
        m = create_model(cfg)
        assert isinstance(m, cls)
        assert m.num_classes == 7

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError):
            create_model(Config({'model': {'type': 'unet'}}))


class TestRemat:
    """model.remat checkpoints encoder blocks in training: the variable
    tree, forward values, and gradients must be identical to remat=False
    (it only trades activation memory for recompute)."""

    def test_remat_is_transparent(self):
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 64, 64, 3)),
            jnp.float32)
        label = jnp.zeros((1, 64, 64), jnp.int32)
        outs, grads = [], []
        for remat in (False, True):
            m = SegFormerModel(num_classes=5, include_depth=False,
                               remat=remat)
            v = m.init(jax.random.PRNGKey(0), x, train=False)
            params = v['params']

            def loss(p):
                out, _ = m.apply(
                    {'params': p, 'batch_stats': v.get('batch_stats', {})},
                    x, train=True, rngs={'dropout': jax.random.PRNGKey(1)},
                    mutable=['batch_stats'])
                logits = out['segmentation']
                oh = jax.nn.one_hot(label, 5)
                return -jnp.mean(jnp.sum(
                    jax.nn.log_softmax(logits) * oh, -1))

            l, g = jax.value_and_grad(loss)(params)
            outs.append(float(l))
            grads.append(g)
        assert outs[0] == pytest.approx(outs[1], rel=1e-6)
        # recompute reassociation moves gradients by ~1e-5 rel
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            grads[0], grads[1])
