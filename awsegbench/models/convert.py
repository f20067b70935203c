"""Weight conversion: HuggingFace SegFormer / torch ResNet → Flax params.

Enables (a) loading pretrained torch checkpoints into the native JAX models
and (b) layer-by-layer numeric parity testing of our architectures against
the reference's backbones (SURVEY.md §7 'SegFormer-B0 reimplementation
fidelity'). Only consumes a plain ``{name: ndarray}`` state dict — no
torch import required at conversion time.

Tensor layout rules:
* torch Conv2d weight (O, I, kH, kW) → flax Conv kernel (kH, kW, I, O)
* torch depthwise Conv2d weight (C, 1, kH, kW) → flax grouped-Conv kernel
  (kH, kW, 1, C)
* torch Linear weight (O, I) → flax Dense kernel (I, O)
* torch LayerNorm weight/bias → flax scale/bias
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dwconv(w: np.ndarray) -> np.ndarray:
    # (C, 1, kH, kW) → (kH, kW, 1, C)
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def convert_hf_segformer_encoder(
        state_dict: Mapping[str, np.ndarray],
        depths: Sequence[int] = (2, 2, 2, 2),
        prefix: str = '') -> Dict:
    """HF ``SegformerModel`` (encoder) state dict → MiTEncoder params tree.

    ``prefix`` strips a leading name (e.g. 'segformer.') when the dict came
    from a wrapping model.
    """
    sd = {k[len(prefix):] if k.startswith(prefix) else k: np.asarray(v)
          for k, v in state_dict.items()}

    params: Dict = {}

    def put(path: str, value: np.ndarray) -> None:
        node = params
        keys = path.split('/')
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    n_stages = len(depths)
    block_idx = 0
    for s in range(n_stages):
        pe = f'encoder.patch_embeddings.{s}'
        put(f'OverlapPatchEmbed_{s}/Conv_0/kernel', _conv(sd[f'{pe}.proj.weight']))
        put(f'OverlapPatchEmbed_{s}/Conv_0/bias', sd[f'{pe}.proj.bias'])
        put(f'OverlapPatchEmbed_{s}/LayerNorm_0/scale', sd[f'{pe}.layer_norm.weight'])
        put(f'OverlapPatchEmbed_{s}/LayerNorm_0/bias', sd[f'{pe}.layer_norm.bias'])

        for j in range(depths[s]):
            hb = f'encoder.block.{s}.{j}'
            ob = f'SegFormerBlock_{block_idx}'
            block_idx += 1

            put(f'{ob}/LayerNorm_0/scale', sd[f'{hb}.layer_norm_1.weight'])
            put(f'{ob}/LayerNorm_0/bias', sd[f'{hb}.layer_norm_1.bias'])
            attn = f'{hb}.attention'
            oa = f'{ob}/EfficientSelfAttention_0'
            put(f'{oa}/Dense_0/kernel', _dense(sd[f'{attn}.self.query.weight']))
            put(f'{oa}/Dense_0/bias', sd[f'{attn}.self.query.bias'])
            if f'{attn}.self.sr.weight' in sd:
                put(f'{oa}/Conv_0/kernel', _conv(sd[f'{attn}.self.sr.weight']))
                put(f'{oa}/Conv_0/bias', sd[f'{attn}.self.sr.bias'])
                put(f'{oa}/LayerNorm_0/scale', sd[f'{attn}.self.layer_norm.weight'])
                put(f'{oa}/LayerNorm_0/bias', sd[f'{attn}.self.layer_norm.bias'])
            put(f'{oa}/Dense_1/kernel', _dense(sd[f'{attn}.self.key.weight']))
            put(f'{oa}/Dense_1/bias', sd[f'{attn}.self.key.bias'])
            put(f'{oa}/Dense_2/kernel', _dense(sd[f'{attn}.self.value.weight']))
            put(f'{oa}/Dense_2/bias', sd[f'{attn}.self.value.bias'])
            put(f'{oa}/Dense_3/kernel', _dense(sd[f'{attn}.output.dense.weight']))
            put(f'{oa}/Dense_3/bias', sd[f'{attn}.output.dense.bias'])

            put(f'{ob}/LayerNorm_1/scale', sd[f'{hb}.layer_norm_2.weight'])
            put(f'{ob}/LayerNorm_1/bias', sd[f'{hb}.layer_norm_2.bias'])
            om = f'{ob}/MixFFN_0'
            put(f'{om}/Dense_0/kernel', _dense(sd[f'{hb}.mlp.dense1.weight']))
            put(f'{om}/Dense_0/bias', sd[f'{hb}.mlp.dense1.bias'])
            put(f'{om}/Conv_0/kernel', _dwconv(sd[f'{hb}.mlp.dwconv.dwconv.weight']))
            put(f'{om}/Conv_0/bias', sd[f'{hb}.mlp.dwconv.dwconv.bias'])
            put(f'{om}/Dense_1/kernel', _dense(sd[f'{hb}.mlp.dense2.weight']))
            put(f'{om}/Dense_1/bias', sd[f'{hb}.mlp.dense2.bias'])

        put(f'LayerNorm_{s}/scale', sd[f'encoder.layer_norm.{s}.weight'])
        put(f'LayerNorm_{s}/bias', sd[f'encoder.layer_norm.{s}.bias'])

    return params


def convert_torch_resnet_encoder(
        state_dict: Mapping[str, np.ndarray],
        layers: Sequence[int] = (3, 4, 6, 3)) -> Dict:
    """torchvision-style ResNet state dict → our ResNetEncoder params tree.

    Maps stem conv1/bn1 and layer{1..4}.{j} bottlenecks (conv1/2/3 + bn1/2/3
    + optional downsample). BN running stats go into a parallel
    'batch_stats' tree returned under key '__batch_stats__'.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    def put(tree: Dict, path: str, value: np.ndarray) -> None:
        node = tree
        keys = path.split('/')
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def bn(torch_prefix: str, flax_prefix: str) -> None:
        put(params, f'{flax_prefix}/scale', sd[f'{torch_prefix}.weight'])
        put(params, f'{flax_prefix}/bias', sd[f'{torch_prefix}.bias'])
        put(stats, f'{flax_prefix}/mean', sd[f'{torch_prefix}.running_mean'])
        put(stats, f'{flax_prefix}/var', sd[f'{torch_prefix}.running_var'])

    # stem
    put(params, 'Conv_0/kernel', _conv(sd['conv1.weight']))
    bn('bn1', 'BatchNorm_0')

    block_idx = 0
    for s, n_blocks in enumerate(layers):
        for j in range(n_blocks):
            tb = f'layer{s + 1}.{j}'
            ob = f'Bottleneck_{block_idx}'
            block_idx += 1
            # ConvBNReLU_0 = 1×1 reduce, ConvBNReLU_1 = 3×3
            put(params, f'{ob}/ConvBNReLU_0/Conv_0/kernel', _conv(sd[f'{tb}.conv1.weight']))
            bn(f'{tb}.bn1', f'{ob}/ConvBNReLU_0/BatchNorm_0')
            put(params, f'{ob}/ConvBNReLU_1/Conv_0/kernel', _conv(sd[f'{tb}.conv2.weight']))
            bn(f'{tb}.bn2', f'{ob}/ConvBNReLU_1/BatchNorm_0')
            put(params, f'{ob}/Conv_0/kernel', _conv(sd[f'{tb}.conv3.weight']))
            bn(f'{tb}.bn3', f'{ob}/BatchNorm_0')
            if f'{tb}.downsample.0.weight' in sd:
                put(params, f'{ob}/Conv_1/kernel', _conv(sd[f'{tb}.downsample.0.weight']))
                bn(f'{tb}.downsample.1', f'{ob}/BatchNorm_1')

    params['__batch_stats__'] = stats
    return params


def _put(tree: Dict, path: str, value: np.ndarray) -> None:
    node = tree
    keys = path.split('/')
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _convert_bn(sd: Mapping[str, np.ndarray], torch_prefix: str,
                params: Dict, stats: Dict, flax_prefix: str) -> None:
    _put(params, f'{flax_prefix}/scale', np.asarray(sd[f'{torch_prefix}.weight']))
    _put(params, f'{flax_prefix}/bias', np.asarray(sd[f'{torch_prefix}.bias']))
    _put(stats, f'{flax_prefix}/mean',
         np.asarray(sd[f'{torch_prefix}.running_mean']))
    _put(stats, f'{flax_prefix}/var',
         np.asarray(sd[f'{torch_prefix}.running_var']))


def _convert_head_stack(sd: Mapping[str, np.ndarray], torch_prefix: str,
                        layer_idx: Sequence[int], params: Dict, stats: Dict,
                        flax_prefix: str) -> None:
    """torch ``nn.Sequential`` head (conv/BN interleaved with activations/
    dropout) → our ConvParams/BatchNormParams holders. ``layer_idx`` lists
    the Sequential indices of the conv/BN layers in order; convs and BNs
    are assigned alternating flax names Conv_0, BatchNorm_0, Conv_1, ...
    matching heads.py's holder layout."""
    conv_i = bn_i = 0
    for idx in layer_idx:
        w = f'{torch_prefix}.{idx}.weight'
        if f'{torch_prefix}.{idx}.running_mean' in sd:  # BatchNorm2d
            _convert_bn(sd, f'{torch_prefix}.{idx}', params, stats,
                        f'{flax_prefix}/BatchNorm_{bn_i}')
            bn_i += 1
        else:  # Conv2d
            _put(params, f'{flax_prefix}/Conv_{conv_i}/kernel',
                 _conv(np.asarray(sd[w])))
            _put(params, f'{flax_prefix}/Conv_{conv_i}/bias',
                 np.asarray(sd[f'{torch_prefix}.{idx}.bias']))
            conv_i += 1


def _convert_conv_bn(sd: Mapping[str, np.ndarray], conv_key: str,
                     bn_prefix: str, params: Dict, stats: Dict,
                     flax_prefix: str) -> None:
    """torch conv(bias-free)+BN pair → our ConvBNReLU module tree."""
    _put(params, f'{flax_prefix}/Conv_0/kernel',
         _conv(np.asarray(sd[conv_key])))
    _convert_bn(sd, bn_prefix, params, stats, f'{flax_prefix}/BatchNorm_0')


def _convert_sep_conv(sd: Mapping[str, np.ndarray], torch_prefix: str,
                      params: Dict, stats: Dict, flax_prefix: str) -> None:
    """depthwise+pointwise+BN triple (``.dw``/``.pw``/``.bn`` naming) →
    our SeparableConvBNReLU module tree."""
    _put(params, f'{flax_prefix}/Conv_0/kernel',
         _dwconv(np.asarray(sd[f'{torch_prefix}.dw.weight'])))
    _put(params, f'{flax_prefix}/Conv_1/kernel',
         _conv(np.asarray(sd[f'{torch_prefix}.pw.weight'])))
    _convert_bn(sd, f'{torch_prefix}.bn', params, stats,
                f'{flax_prefix}/BatchNorm_0')


def convert_reference_segformer_member(
        state_dict: Mapping[str, np.ndarray],
        prefix: str = '') -> Dict:
    """Reference ``SegFormerModel`` member (model.py:81-223) state dict →
    our ``SegFormerModel`` variables {'params', 'batch_stats'}.

    Covers the HF MiT encoder (via :func:`convert_hf_segformer_encoder`),
    the conv segmentation head (model.py:152-158) and the depth head
    (model.py:160-166 → 16-52). ``prefix`` strips e.g. 'segformer.' when
    the dict came from the reference EnsembleModel."""
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    params: Dict = {}
    stats: Dict = {}
    params['MiTEncoder_0'] = convert_hf_segformer_encoder(
        sd, prefix='segformer.')
    # seg head Sequential: 0=Conv3×3, 1=BN, 2=ReLU, 3=Dropout, 4=Conv1×1
    _convert_head_stack(sd, 'segmentation_head', (0, 1, 4), params, stats,
                        'SegmentationHead_0')
    if 'depth_head.depth_head.0.weight' in sd:
        # depth head Sequential: 0=Conv, 1=BN, 4=Conv, 5=BN, 7=Conv1×1
        _convert_head_stack(sd, 'depth_head.depth_head', (0, 1, 4, 5, 7),
                            params, stats, 'DepthEstimationHead_0')
    return {'params': params, 'batch_stats': stats}


def convert_reference_deeplab_member(
        state_dict: Mapping[str, np.ndarray],
        prefix: str = '',
        layers: Sequence[int] = (3, 4, 6, 3)) -> Dict:
    """Reference ``DeepLabV3PlusModel`` member (model.py:226-374, the smp
    branch) state dict → our ``DeepLabV3PlusModel`` variables.

    Expects the smp-equivalent layout used by our torch twin (an encoder
    with torchvision ResNet naming under ``model.encoder.``, ASPP branches
    ``model.aspp.{b0,sep0..2,pool,proj}``, decoder ``model.{pre,low_proj,
    fuse,cls}``) plus the wrapper-level ``depth_head`` (model.py:350-372).
    """
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    params: Dict = {}
    stats: Dict = {}

    enc_sd = {k[len('model.encoder.'):]: v for k, v in sd.items()
              if k.startswith('model.encoder.')}
    enc = convert_torch_resnet_encoder(enc_sd, layers=layers)
    enc_stats = enc.pop('__batch_stats__')
    params['ResNetEncoder_0'] = enc
    stats['ResNetEncoder_0'] = enc_stats

    _convert_conv_bn(sd, 'model.aspp.b0.conv.weight', 'model.aspp.b0.bn',
                     params, stats, 'ASPP_0/ConvBNReLU_0')
    for i in range(3):
        _convert_sep_conv(sd, f'model.aspp.sep{i}', params, stats,
                          f'ASPP_0/SeparableConvBNReLU_{i}')
    _convert_conv_bn(sd, 'model.aspp.pool.conv.weight', 'model.aspp.pool.bn',
                     params, stats, 'ASPP_0/ConvBNReLU_1')
    _convert_conv_bn(sd, 'model.aspp.proj.conv.weight', 'model.aspp.proj.bn',
                     params, stats, 'ASPP_0/ConvBNReLU_2')
    _convert_sep_conv(sd, 'model.pre', params, stats,
                      'SeparableConvBNReLU_0')
    _convert_conv_bn(sd, 'model.low_proj.conv.weight', 'model.low_proj.bn',
                     params, stats, 'ConvBNReLU_0')
    _convert_sep_conv(sd, 'model.fuse', params, stats,
                      'SeparableConvBNReLU_1')
    _put(params, 'Conv_0/kernel', _conv(np.asarray(sd['model.cls.weight'])))
    _put(params, 'Conv_0/bias', np.asarray(sd['model.cls.bias']))

    if 'depth_head.depth_head.0.weight' in sd:
        _convert_head_stack(sd, 'depth_head.depth_head', (0, 1, 4, 5, 7),
                            params, stats, 'DepthEstimationHead_0')
    return {'params': params, 'batch_stats': stats}


def convert_reference_ensemble(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Full reference ``EnsembleModel`` (model.py:377-513) state dict → our
    ``EnsembleModel`` variables, including the learnable ensemble weights
    and temperature (model.py:420-424).

    This is the migration path for users bringing reference-trained
    checkpoints into the TPU framework, and the basis of the end-to-end
    cross-framework parity oracle (tests/test_model_oracle.py)."""
    seg = convert_reference_segformer_member(state_dict,
                                             prefix='segformer.')
    dlv = convert_reference_deeplab_member(state_dict,
                                           prefix='deeplabv3plus.')
    params = {'segformer': seg['params'], 'deeplabv3plus': dlv['params'],
              'ensemble_weights': np.asarray(state_dict['ensemble_weights'])}
    if 'temperature' in state_dict:
        params['temperature'] = np.asarray(state_dict['temperature'])
    stats = {'segformer': seg['batch_stats'],
             'deeplabv3plus': dlv['batch_stats']}
    return {'params': params, 'batch_stats': stats}


def merge_encoder_params(target_params: Dict, encoder_params: Dict,
                         encoder_scope: str) -> Dict:
    """Graft converted encoder params into a full model params tree
    (e.g. encoder_scope='MiTEncoder_0' inside SegFormerModel params)."""
    import copy
    out = copy.deepcopy(dict(target_params))
    node = out
    keys = encoder_scope.split('/')
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = encoder_params
    return out
