"""MiT family (B0–B5) variant support.

The reference reaches non-B0 encoders through HF ``model_name`` ids
(reference model.py:91,:113-146) and derives head input width from
``hidden_sizes[-1]`` (model.py:149); here the family is first-class config
(``model.segformer_variant``). These tests pin name resolution, factory
wiring, forward shapes, and capacity ordering on tiny inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awsegbench.models import (MIT_VARIANTS, EnsembleModel, SegFormerModel,
                               count_parameters, create_model,
                               mit_variant_config, mit_variant_name)
from awsegbench.utils.config import Config


class TestVariantResolution:
    def test_short_names(self):
        for name in MIT_VARIANTS:
            assert mit_variant_name(name) == name
            assert mit_variant_name(name.upper()) == name

    def test_hf_model_ids(self):
        assert mit_variant_name(
            'nvidia/segformer-b1-finetuned-ade-512-512') == 'b1'
        assert mit_variant_name(
            'nvidia/segformer-b4-finetuned-cityscapes-1024-1024') == 'b4'
        assert mit_variant_name('nvidia/mit-b2') == 'b2'

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match='unknown MiT variant'):
            mit_variant_name('b9')
        with pytest.raises(ValueError, match='unknown MiT variant'):
            mit_variant_name('resnet50')

    def test_config_tables(self):
        # paper table 7: B0 is the narrow one; B1+ share widths and deepen
        assert mit_variant_config('b0') == ((32, 64, 160, 256), (2, 2, 2, 2))
        assert mit_variant_config('b1') == ((64, 128, 320, 512), (2, 2, 2, 2))
        assert mit_variant_config('b5')[1] == (3, 6, 40, 3)


class TestVariantModels:
    def _init_params(self, model, h=32, w=64):
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        variables = model.init({'params': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(1)},
                               x, train=False)
        return variables, x

    def test_b1_segformer_forward_shapes(self):
        hidden_sizes, depths = mit_variant_config('b1')
        model = SegFormerModel(num_classes=5, hidden_sizes=hidden_sizes,
                               depths=depths)
        variables, x = self._init_params(model)
        out = model.apply(variables, x, train=False)
        assert out['segmentation'].shape == (1, 32, 64, 5)
        assert out['depth'].shape == (1, 32, 64, 1)

    def test_capacity_ordering(self):
        counts = {}
        for v in ('b0', 'b1', 'b2'):
            hidden_sizes, depths = mit_variant_config(v)
            model = SegFormerModel(num_classes=5, include_depth=False,
                                   hidden_sizes=hidden_sizes, depths=depths)
            variables, _ = self._init_params(model)
            counts[v] = count_parameters(variables['params'])
        assert counts['b0'] < counts['b1'] < counts['b2']

    def test_factory_variant_and_model_name(self):
        cfg = Config({'model': {'type': 'segformer', 'num_classes': 5,
                                'segformer_variant': 'b1',
                                'pretrained': False}})
        m = create_model(cfg)
        assert tuple(m.hidden_sizes) == (64, 128, 320, 512)
        # reference-style HF id through the model_name key
        cfg2 = Config({'model': {
            'type': 'segformer', 'num_classes': 5, 'pretrained': False,
            'model_name': 'nvidia/segformer-b2-finetuned-ade-512-512'}})
        m2 = create_model(cfg2)
        assert tuple(m2.depths) == (3, 4, 6, 3)

    def test_unrecognized_model_name_falls_back_to_b0(self):
        # the reference accepts arbitrary model_name ids (model.py:91) —
        # no bN token means b0 geometry + a warning, not a startup crash
        cfg = Config({'model': {
            'type': 'segformer', 'num_classes': 5, 'pretrained': False,
            'model_name': 'myorg/segformer-cityscapes-custom'}})
        m = create_model(cfg)
        assert tuple(m.hidden_sizes) == (32, 64, 160, 256)
        # explicit segformer_variant stays strict
        cfg2 = Config({'model': {
            'type': 'segformer', 'num_classes': 5, 'pretrained': False,
            'segformer_variant': 'b9'}})
        with pytest.raises(ValueError, match='unknown MiT variant'):
            create_model(cfg2)

    def test_ensemble_variant_forward(self):
        cfg = Config({'model': {'type': 'ensemble', 'num_classes': 5,
                                'segformer_variant': 'b1',
                                'pretrained': False}})
        model = create_model(cfg)
        assert isinstance(model, EnsembleModel)
        assert model.segformer_variant == 'b1'
        variables, x = self._init_params(model)
        out = model.apply(variables, x, train=False)
        assert out['segmentation'].shape == (1, 32, 64, 5)
        assert out['segformer_seg'].shape == (1, 32, 64, 5)

    def test_default_is_b0(self):
        cfg = Config({'model': {'type': 'ensemble', 'num_classes': 5,
                                'pretrained': False}})
        model = create_model(cfg)
        assert model.segformer_variant == 'b0'


class TestVariantTensorParallel:
    """The TP rules are shape-driven (core/mesh.py::tp_param_shardings), so
    the wider MiT members must shard on the model axis at the PRODUCTION
    min_features=64 — b1's stage-1 width (64) already qualifies where
    b0's (32) does not — and the partitioned forward must equal the
    replicated one."""

    def test_b1_shards_at_default_min_features_and_matches(self):
        from awsegbench.core.mesh import (MODEL_AXIS, create_mesh,
                                          tp_param_shardings)

        hidden_sizes, depths = mit_variant_config('b1')
        model = SegFormerModel(num_classes=5, include_depth=False,
                               hidden_sizes=hidden_sizes, depths=depths)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 64, 3),
                              jnp.float32)
        variables = model.init({'params': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(1)},
                               x, train=False)
        ref = model.apply(variables, x, train=False)['segmentation']

        mesh = create_mesh(mesh_shape={'data': 4, 'model': 2})
        shardings = tp_param_shardings(variables['params'], mesh)  # default 64
        n_model = sum(MODEL_AXIS in str(s.spec)
                      for s in jax.tree_util.tree_leaves(shardings))
        assert n_model > 0, 'b1 kernels must shard at min_features=64'
        placed = jax.tree_util.tree_map(jax.device_put,
                                        variables['params'], shardings)

        bs = variables.get('batch_stats', {})
        out = jax.jit(lambda p: model.apply(
            {'params': p, 'batch_stats': bs}, x,
            train=False)['segmentation'])(placed)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_b0_stage1_stays_replicated_at_default(self):
        from awsegbench.core.mesh import create_mesh, tp_param_shardings

        hidden_sizes, depths = mit_variant_config('b0')
        model = SegFormerModel(num_classes=5, include_depth=False,
                               hidden_sizes=hidden_sizes, depths=depths)
        variables = model.init({'params': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(1)},
                               jnp.zeros((1, 32, 64, 3)), train=False)
        mesh = create_mesh(mesh_shape={'data': 4, 'model': 2})
        sh = tp_param_shardings(variables['params'], mesh)
        psh = list(zip(jax.tree_util.tree_leaves(variables['params']),
                       jax.tree_util.tree_leaves(sh)))
        narrow = [s for p, s in psh if p.ndim >= 2 and p.shape[-1] == 32]
        wide = [s for p, s in psh if p.ndim >= 2 and p.shape[-1] == 256]
        assert narrow and wide  # b0 stage-1 q/k/v/proj are 32-wide
        assert all('model' not in str(s.spec) for s in narrow)
        assert any('model' in str(s.spec) for s in wide)
