"""AOT serving export (awsegbench/serving.py).

Deployment is a framework extension (the reference stops at checkpoints);
these tests pin the contract: a serialized artifact reloads without model
code and reproduces the in-process eval forward exactly, shapes are
static and loudly enforced, and cross-platform export (tpu from a CPU
host) serializes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from awsegbench.models import EnsembleModel, init_model
from awsegbench.serving import (ServingModel, build_serving_fn,
                                export_serving, save_serving_artifact)


@pytest.fixture(scope='module')
def tiny_model():
    model = EnsembleModel(num_classes=5, include_depth=True)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 32, 64, 3))
    return model, variables


class TestServingExport:
    def test_roundtrip_matches_direct_forward(self, tiny_model, tmp_path):
        model, variables = tiny_model
        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, (2, 32, 64, 3), dtype=np.uint8)

        serve = build_serving_fn(model, variables, precision='fp32')
        direct = serve(jnp.asarray(x))

        blob = export_serving(model, variables, (32, 64), batch_size=2,
                              precision='fp32')
        out = save_serving_artifact(
            tmp_path / 'artifact', blob,
            {'input_shape': [2, 32, 64, 3], 'num_classes': 5})
        loaded = ServingModel.load(out)
        res = loaded.predict(x)

        assert res['segmentation'].shape == (2, 32, 64, 5)
        assert res['depth'].shape == (2, 32, 64, 1)
        np.testing.assert_allclose(np.asarray(res['segmentation']),
                                   np.asarray(direct['segmentation']),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(res['depth']),
                                   np.asarray(direct['depth']), atol=5e-5)

    def test_bf16_policy_export_runs(self, tiny_model, tmp_path):
        model, variables = tiny_model
        blob = export_serving(model, variables, (32, 64), batch_size=1,
                              precision='bf16')
        out = save_serving_artifact(tmp_path / 'bf16', blob,
                                    {'input_shape': [1, 32, 64, 3]})
        loaded = ServingModel.load(out)
        res = loaded.predict(np.zeros((1, 32, 64, 3), np.uint8))
        # logits come back f32 regardless of the compute dtype
        assert np.asarray(res['segmentation']).dtype == np.float32
        assert np.all(np.isfinite(np.asarray(res['segmentation'])))

    def test_static_shape_enforced(self, tiny_model, tmp_path):
        model, variables = tiny_model
        blob = export_serving(model, variables, (32, 64), batch_size=1,
                              precision='fp32')
        out = save_serving_artifact(tmp_path / 'static', blob,
                                    {'input_shape': [1, 32, 64, 3]})
        loaded = ServingModel.load(out)
        with pytest.raises(ValueError, match='static at export'):
            loaded.predict(np.zeros((2, 32, 64, 3), np.uint8))
        with pytest.raises(ValueError, match='static at export'):
            loaded.predict(np.zeros((1, 32, 64, 3), np.float32))

    def test_cross_platform_tpu_export_serializes(self, tiny_model):
        """Lowering for TPU needs no TPU device; the artifact records the
        target platform and refuses to run elsewhere at call time."""
        model, variables = tiny_model
        blob = export_serving(model, variables, (32, 64), batch_size=1,
                              precision='bf16', platforms=('tpu',))
        assert len(blob) > 1000
        exported = jax.export.deserialize(blob)
        assert tuple(exported.platforms) == ('tpu',)

    def test_batch_polymorphic_export(self, tiny_model, tmp_path):
        """batch_size='poly': one artifact serves any batch size."""
        model, variables = tiny_model
        blob = export_serving(model, variables, (32, 64),
                              batch_size='poly', precision='fp32')
        out = save_serving_artifact(tmp_path / 'poly', blob,
                                    {'input_shape': ['poly', 32, 64, 3]})
        loaded = ServingModel.load(out)
        for bs in (1, 3):
            res = loaded.predict(
                np.zeros((bs, 32, 64, 3), np.uint8))
            assert res['segmentation'].shape == (bs, 32, 64, 5)
        with pytest.raises(ValueError, match='static at export'):
            loaded.predict(np.zeros((1, 16, 64, 3), np.uint8))

    def test_no_depth_export(self, tiny_model):
        model, variables = tiny_model
        blob = export_serving(model, variables, (32, 64), batch_size=1,
                              precision='fp32', include_depth=False)
        exported = jax.export.deserialize(blob)
        res = exported.call(jnp.zeros((1, 32, 64, 3), jnp.uint8))
        assert set(res.keys()) == {'segmentation'}
