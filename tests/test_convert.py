"""Weight-conversion + architecture-parity tests.

Builds a randomly-initialized HuggingFace ``SegformerModel`` B0 from config
(no download — the same fallback path the reference uses at
model.py:120-131), converts its weights into our native MiT encoder, and
asserts the two produce the same features — the strongest possible check
that the Flax reimplementation matches the reference's backbone
architecture (SURVEY.md §7).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from awsegbench.models.convert import (convert_hf_segformer_encoder,
                                       convert_torch_resnet_encoder)
from awsegbench.models.segformer import MiTEncoder

torch = pytest.importorskip('torch')
transformers = pytest.importorskip('transformers')


@pytest.fixture(scope='module')
def hf_segformer_b0():
    from transformers import SegformerConfig, SegformerModel
    config = SegformerConfig(
        num_channels=3,
        num_encoder_blocks=4,
        depths=[2, 2, 2, 2],
        sr_ratios=[8, 4, 2, 1],
        hidden_sizes=[32, 64, 160, 256],
        patch_sizes=[7, 3, 3, 3],
        strides=[4, 2, 2, 2],
        num_attention_heads=[1, 2, 5, 8],
        mlp_ratios=[4, 4, 4, 4],
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    torch.manual_seed(0)
    model = SegformerModel(config)
    model.eval()
    return model


@pytest.mark.slow
class TestHFSegformerParity:
    def test_encoder_last_hidden_state_parity(self, hf_segformer_b0):
        """Converted weights → identical features to HF torch (fp32)."""
        h, w = 64, 128  # divisible by 32 so SAME == torch's padding
        x = np.random.default_rng(0).normal(size=(1, 3, h, w)).astype(np.float32)

        with torch.no_grad():
            ref = hf_segformer_b0(torch.from_numpy(x)).last_hidden_state
        ref = ref.numpy()  # [1, 256, h/32, w/32]

        sd = {k: v.numpy() for k, v in hf_segformer_b0.state_dict().items()}
        params = convert_hf_segformer_encoder(sd)

        enc = MiTEncoder()
        ours = enc.apply({'params': params},
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))))[-1]
        ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))

        err = np.abs(ref - ours).max()
        assert err < 2e-4, f"encoder feature mismatch: {err}"

    def test_all_stage_features_parity(self, hf_segformer_b0):
        h, w = 64, 128
        x = np.random.default_rng(1).normal(size=(1, 3, h, w)).astype(np.float32)
        with torch.no_grad():
            hf_out = hf_segformer_b0(torch.from_numpy(x),
                                     output_hidden_states=True)
        sd = {k: v.numpy() for k, v in hf_segformer_b0.state_dict().items()}
        params = convert_hf_segformer_encoder(sd)
        enc = MiTEncoder()
        ours = enc.apply({'params': params},
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        # HF hidden_states are per-stage spatial maps [B, C, H, W]
        for i, (ref_t, our) in enumerate(zip(hf_out.hidden_states, ours)):
            ref_np = ref_t.numpy()
            our_np = np.transpose(np.asarray(our), (0, 3, 1, 2))
            err = np.abs(ref_np - our_np).max()
            assert err < 2e-4, f"stage {i} mismatch: {err}"


class TestResNetConverter:
    def test_converted_tree_loads_into_encoder(self):
        """A synthetic torchvision-style state dict converts into a tree
        whose leaves match our ResNetEncoder's param shapes."""
        from awsegbench.models.deeplab import ResNetEncoder
        enc = ResNetEncoder(layers=(1, 1, 1, 1), widths=(8, 16, 24, 32))
        variables = enc.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 3)), False)

        # build a fake torch state dict with matching shapes
        sd = {}
        sd['conv1.weight'] = np.zeros((64, 3, 7, 7), np.float32)
        for bn in ['bn1']:
            sd[f'{bn}.weight'] = np.ones((64,), np.float32)
            sd[f'{bn}.bias'] = np.zeros((64,), np.float32)
            sd[f'{bn}.running_mean'] = np.zeros((64,), np.float32)
            sd[f'{bn}.running_var'] = np.ones((64,), np.float32)

        widths = (8, 16, 24, 32)
        in_ch = 64
        for s in range(4):
            w = widths[s]
            tb = f'layer{s + 1}.0'
            sd[f'{tb}.conv1.weight'] = np.zeros((w, in_ch, 1, 1), np.float32)
            sd[f'{tb}.conv2.weight'] = np.zeros((w, w, 3, 3), np.float32)
            sd[f'{tb}.conv3.weight'] = np.zeros((w * 4, w, 1, 1), np.float32)
            for i, ch in [(1, w), (2, w), (3, w * 4)]:
                sd[f'{tb}.bn{i}.weight'] = np.ones((ch,), np.float32)
                sd[f'{tb}.bn{i}.bias'] = np.zeros((ch,), np.float32)
                sd[f'{tb}.bn{i}.running_mean'] = np.zeros((ch,), np.float32)
                sd[f'{tb}.bn{i}.running_var'] = np.ones((ch,), np.float32)
            sd[f'{tb}.downsample.0.weight'] = np.zeros((w * 4, in_ch, 1, 1),
                                                       np.float32)
            sd[f'{tb}.downsample.1.weight'] = np.ones((w * 4,), np.float32)
            sd[f'{tb}.downsample.1.bias'] = np.zeros((w * 4,), np.float32)
            sd[f'{tb}.downsample.1.running_mean'] = np.zeros((w * 4,), np.float32)
            sd[f'{tb}.downsample.1.running_var'] = np.ones((w * 4,), np.float32)
            in_ch = w * 4

        converted = convert_torch_resnet_encoder(sd, layers=(1, 1, 1, 1))
        stats = converted.pop('__batch_stats__')

        def shapes(tree):
            return {jax.tree_util.keystr(p): v.shape for p, v in
                    jax.tree_util.tree_flatten_with_path(tree)[0]}

        ours_p = shapes(variables['params'])
        conv_p = shapes(converted)
        assert set(conv_p) == set(ours_p)
        for k in ours_p:
            assert conv_p[k] == ours_p[k], k

        ours_s = shapes(variables['batch_stats'])
        conv_s = shapes(stats)
        assert set(conv_s) == set(ours_s)
