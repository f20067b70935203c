"""Pretrained-weight resolution + grafting tests.

VERDICT round-1 item #2: the reference defaults to pretrained encoders with
graceful fallback (model.py:94,111-146 HF SegFormer; model.py:239,258-274
smp ImageNet R50). These tests graft synthetic-but-real-shaped state dicts
end-to-end into the models from a fake ``$AWSEG_WEIGHTS_DIR`` cache, and
assert the factory path activates automatically and degrades gracefully.
"""

import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from awsegbench.models.convert import convert_hf_segformer_encoder
from awsegbench.models.factory import create_model, init_model, \
    init_model_variables
from awsegbench.models.pretrained import (apply_pretrained,
                                          find_weights_file,
                                          load_state_dict,
                                          resolve_weights_dir)
from awsegbench.utils.config import Config


def make_resnet50_state_dict(rng) -> dict:
    """Real-shaped torchvision-style ResNet-50 state dict, random values."""
    sd = {}

    def bn(prefix, ch):
        sd[f'{prefix}.weight'] = rng.normal(size=(ch,)).astype(np.float32)
        sd[f'{prefix}.bias'] = rng.normal(size=(ch,)).astype(np.float32)
        sd[f'{prefix}.running_mean'] = rng.normal(size=(ch,)).astype(np.float32)
        sd[f'{prefix}.running_var'] = np.abs(
            rng.normal(size=(ch,))).astype(np.float32) + 0.5

    sd['conv1.weight'] = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
    bn('bn1', 64)
    in_ch = 64
    for s, (n_blocks, w) in enumerate(zip((3, 4, 6, 3),
                                          (64, 128, 256, 512))):
        for j in range(n_blocks):
            tb = f'layer{s + 1}.{j}'
            sd[f'{tb}.conv1.weight'] = rng.normal(
                size=(w, in_ch, 1, 1)).astype(np.float32)
            bn(f'{tb}.bn1', w)
            sd[f'{tb}.conv2.weight'] = rng.normal(
                size=(w, w, 3, 3)).astype(np.float32)
            bn(f'{tb}.bn2', w)
            sd[f'{tb}.conv3.weight'] = rng.normal(
                size=(w * 4, w, 1, 1)).astype(np.float32)
            bn(f'{tb}.bn3', w * 4)
            if j == 0:
                sd[f'{tb}.downsample.0.weight'] = rng.normal(
                    size=(w * 4, in_ch, 1, 1)).astype(np.float32)
                bn(f'{tb}.downsample.1', w * 4)
            in_ch = w * 4
    return sd


def make_segformer_b0_state_dict(rng, prefix='') -> dict:
    """Real-shaped HF ``SegformerModel`` B0 state dict, random values.

    Key schema mirrors transformers' SegformerModel (the same names the
    reference's encoder downloads, model.py:91); shapes follow the B0
    config: hidden_sizes (32,64,160,256), depths (2,2,2,2),
    sr_ratios (8,4,2,1), patch sizes (7,3,3,3), strides (4,2,2,2).
    """
    hidden = (32, 64, 160, 256)
    depths = (2, 2, 2, 2)
    sr = (8, 4, 2, 1)
    patch = (7, 3, 3, 3)
    mlp_ratio = 4
    sd = {}

    def arr(*shape):
        return rng.normal(size=shape).astype(np.float32)

    in_ch = 3
    for s in range(4):
        h = hidden[s]
        pe = f'{prefix}encoder.patch_embeddings.{s}'
        sd[f'{pe}.proj.weight'] = arr(h, in_ch, patch[s], patch[s])
        sd[f'{pe}.proj.bias'] = arr(h)
        sd[f'{pe}.layer_norm.weight'] = arr(h)
        sd[f'{pe}.layer_norm.bias'] = arr(h)
        in_ch = h
        for j in range(depths[s]):
            hb = f'{prefix}encoder.block.{s}.{j}'
            for ln in ('layer_norm_1', 'layer_norm_2'):
                sd[f'{hb}.{ln}.weight'] = arr(h)
                sd[f'{hb}.{ln}.bias'] = arr(h)
            at = f'{hb}.attention'
            for qkv in ('query', 'key', 'value'):
                sd[f'{at}.self.{qkv}.weight'] = arr(h, h)
                sd[f'{at}.self.{qkv}.bias'] = arr(h)
            if sr[s] > 1:
                sd[f'{at}.self.sr.weight'] = arr(h, h, sr[s], sr[s])
                sd[f'{at}.self.sr.bias'] = arr(h)
                sd[f'{at}.self.layer_norm.weight'] = arr(h)
                sd[f'{at}.self.layer_norm.bias'] = arr(h)
            sd[f'{at}.output.dense.weight'] = arr(h, h)
            sd[f'{at}.output.dense.bias'] = arr(h)
            m = h * mlp_ratio
            sd[f'{hb}.mlp.dense1.weight'] = arr(m, h)
            sd[f'{hb}.mlp.dense1.bias'] = arr(m)
            sd[f'{hb}.mlp.dwconv.dwconv.weight'] = arr(m, 1, 3, 3)
            sd[f'{hb}.mlp.dwconv.dwconv.bias'] = arr(m)
            sd[f'{hb}.mlp.dense2.weight'] = arr(h, m)
            sd[f'{hb}.mlp.dense2.bias'] = arr(h)
        sd[f'{prefix}encoder.layer_norm.{s}.weight'] = arr(h)
        sd[f'{prefix}encoder.layer_norm.{s}.bias'] = arr(h)
    return sd


@pytest.fixture
def weights_dir(tmp_path, monkeypatch):
    d = tmp_path / 'weights'
    d.mkdir()
    monkeypatch.setenv('AWSEG_WEIGHTS_DIR', str(d))
    return d


def _ensemble_config(pretrained=True):
    return Config({'model': {'type': 'ensemble', 'num_classes': 19,
                             'include_depth': True,
                             'pretrained': pretrained}})


class TestResolution:
    def test_env_dir_and_file_lookup(self, weights_dir):
        assert resolve_weights_dir() == weights_dir
        assert find_weights_file('segformer_b0') is None
        np.savez(weights_dir / 'segformer_b0.npz', x=np.zeros(1))
        assert find_weights_file('segformer_b0') == \
            weights_dir / 'segformer_b0.npz'

    def test_npz_roundtrip(self, weights_dir):
        sd = {'a.b': np.arange(3.0), 'c': np.ones((2, 2))}
        np.savez(weights_dir / 'resnet50.npz', **sd)
        back = load_state_dict(weights_dir / 'resnet50.npz')
        assert set(back) == set(sd)
        assert np.allclose(back['a.b'], sd['a.b'])


@pytest.mark.slow
class TestEnsembleGraft:
    def test_end_to_end_graft_and_forward(self, weights_dir):
        """Both encoders graft into a full EnsembleModel from the cache dir,
        automatically through the factory path, and the model still runs."""
        rng = np.random.default_rng(0)
        seg_sd = make_segformer_b0_state_dict(rng, prefix='segformer.')
        res_sd = make_resnet50_state_dict(rng)
        np.savez(weights_dir / 'segformer_b0.npz', **seg_sd)
        np.savez(weights_dir / 'resnet50.npz', **res_sd)

        config = _ensemble_config(pretrained=True)
        model = create_model(config)
        variables = init_model_variables(model, config, jax.random.PRNGKey(0),
                                         (1, 32, 64, 3))

        # SegFormer encoder leaf == converted value ('segformer.' prefix
        # stripped, conv kernel transposed OIHW→HWIO)
        k = variables['params']['segformer']['MiTEncoder_0'][
            'OverlapPatchEmbed_0']['Conv_0']['kernel']
        expect = np.transpose(seg_sd['segformer.encoder.patch_embeddings.0'
                                     '.proj.weight'], (2, 3, 1, 0))
        assert np.allclose(np.asarray(k), expect)

        # ResNet stem kernel + BN running stats grafted
        k = variables['params']['deeplabv3plus']['ResNetEncoder_0'][
            'Conv_0']['kernel']
        assert np.allclose(np.asarray(k),
                           np.transpose(res_sd['conv1.weight'], (2, 3, 1, 0)))
        m = variables['batch_stats']['deeplabv3plus']['ResNetEncoder_0'][
            'BatchNorm_0']['mean']
        assert np.allclose(np.asarray(m), res_sd['bn1.running_mean'])

        # the grafted tree is structurally valid: a forward pass runs
        out = model.apply(variables, jnp.zeros((1, 32, 64, 3)), train=False)
        assert out['segmentation'].shape == (1, 32, 64, 19)

    def test_missing_cache_falls_back_to_random(self, weights_dir, caplog):
        """Empty cache dir → same params as a plain init (reference
        fallback contract), with a warning."""
        config = _ensemble_config(pretrained=True)
        model = create_model(config)
        with caplog.at_level(logging.WARNING,
                             logger='awsegbench.models.pretrained'):
            v_pre = init_model_variables(model, config, jax.random.PRNGKey(3),
                                         (1, 32, 64, 3))
        v_plain = init_model(model, jax.random.PRNGKey(3), (1, 32, 64, 3))
        a = jax.tree_util.tree_leaves(v_pre['params'])
        b = jax.tree_util.tree_leaves(v_plain['params'])
        assert all(np.allclose(x, y) for x, y in zip(a, b))
        assert any('not found' in r.message for r in caplog.records)

    def test_malformed_file_falls_back(self, weights_dir, caplog):
        """A wrong-shaped weights file is rejected per-encoder with a
        warning; init still succeeds (model.py:111-146 contract)."""
        np.savez(weights_dir / 'resnet50.npz',
                 **{'conv1.weight': np.zeros((8, 3, 3, 3), np.float32)})
        config = _ensemble_config(pretrained=True)
        model = create_model(config)
        with caplog.at_level(logging.WARNING,
                             logger='awsegbench.models.pretrained'):
            v = init_model_variables(model, config, jax.random.PRNGKey(4),
                                     (1, 32, 64, 3))
        assert v['params'] is not None
        assert any('Could not load pretrained' in r.message
                   for r in caplog.records)

    def test_pretrained_false_skips_cache(self, weights_dir):
        np.savez(weights_dir / 'resnet50.npz', junk=np.zeros(1))
        config = _ensemble_config(pretrained=False)
        model = create_model(config)
        v = init_model_variables(model, config, jax.random.PRNGKey(5),
                                 (1, 32, 64, 3))
        v_plain = init_model(model, jax.random.PRNGKey(5), (1, 32, 64, 3))
        a = jax.tree_util.tree_leaves(v['params'])
        b = jax.tree_util.tree_leaves(v_plain['params'])
        assert all(np.allclose(x, y) for x, y in zip(a, b))


class TestStandaloneGraft:
    def test_segformer_standalone_scope(self, weights_dir):
        rng = np.random.default_rng(1)
        seg_sd = make_segformer_b0_state_dict(rng)  # no prefix
        np.savez(weights_dir / 'segformer_b0.npz', **seg_sd)
        config = Config({'model': {'type': 'segformer', 'num_classes': 19,
                                   'include_depth': False,
                                   'pretrained': True}})
        model = create_model(config)
        v = init_model_variables(model, config, jax.random.PRNGKey(2),
                                 (1, 32, 64, 3))
        k = v['params']['MiTEncoder_0']['OverlapPatchEmbed_0']['Conv_0'][
            'kernel']
        expect = np.transpose(
            seg_sd['encoder.patch_embeddings.0.proj.weight'], (2, 3, 1, 0))
        assert np.allclose(np.asarray(k), expect)

    def test_conversion_matches_direct_converter(self, weights_dir):
        """apply_pretrained's graft equals a direct converter call —
        guards the scope-path plumbing."""
        rng = np.random.default_rng(6)
        seg_sd = make_segformer_b0_state_dict(rng)
        np.savez(weights_dir / 'segformer_b0.npz', **seg_sd)
        config = Config({'model': {'type': 'segformer', 'num_classes': 5,
                                   'include_depth': False,
                                   'pretrained': True}})
        model = create_model(config)
        v0 = init_model(model, jax.random.PRNGKey(7), (1, 32, 64, 3))
        v1 = apply_pretrained(v0, dict(config.get('model')))
        direct = convert_hf_segformer_encoder(seg_sd)
        ours = v1['params']['MiTEncoder_0']
        da = jax.tree_util.tree_leaves(direct)
        db = jax.tree_util.tree_leaves(ours)
        assert len(da) == len(db)
        assert all(np.allclose(x, y) for x, y in zip(da, db))
        # input (v0) untouched
        k0 = v0['params']['MiTEncoder_0']['OverlapPatchEmbed_0']['Conv_0'][
            'kernel']
        k1 = v1['params']['MiTEncoder_0']['OverlapPatchEmbed_0']['Conv_0'][
            'kernel']
        assert not np.allclose(np.asarray(k0), np.asarray(k1))
