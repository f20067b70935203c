"""SegFormer (MiT) encoder + model, implemented natively in Flax.

Replaces the reference's HuggingFace ``SegformerModel`` dependency
(model.py:81-223). Architecture matches the B0 config the reference
constructs (model.py:120-130): 4 hierarchical stages of overlapped patch
embeddings (k=7/3/3/3, s=4/2/2/2), efficient spatial-reduction attention
(sr_ratios [8,4,2,1], heads [1,2,5,8]), Mix-FFN with a 3×3 depthwise conv,
depths [2,2,2,2], widths [32,64,160,256].

Layout is NHWC throughout (TPU-native); attention runs on [B, H·W, C]
tokens. The reference's head path is reproduced exactly: the final-stage
feature map is bilinearly upsampled to the input resolution *before* the
segmentation/depth heads (model.py:209-221). ``head_mode='fused'`` instead
runs the heads at stage-4 resolution and upsamples logits — a documented
fast path that avoids materializing [B, H, W, 256] activations.
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import upsample_like
from .heads import DepthEstimationHead, SegmentationHead

# trunc_normal(0.02) like HF/timm transformer inits
trunc02 = nn.initializers.truncated_normal(stddev=0.02)

# MiT family (SegFormer paper table 7): (hidden_sizes, depths). All share
# heads (1,2,5,8), sr_ratios (8,4,2,1), mlp_ratios (4,4,4,4), patch
# geometry 7/3/3/3 s4/2/2/2. The reference reaches these through HF
# ``model_name`` ids (model.py:91,:113-146); here they are first-class
# configs — heads adapt automatically (feature_dim = hidden_sizes[-1],
# as model.py:149).
MIT_VARIANTS: dict[str, tuple[tuple[int, ...], tuple[int, ...]]] = {
    'b0': ((32, 64, 160, 256), (2, 2, 2, 2)),
    'b1': ((64, 128, 320, 512), (2, 2, 2, 2)),
    'b2': ((64, 128, 320, 512), (3, 4, 6, 3)),
    'b3': ((64, 128, 320, 512), (3, 4, 18, 3)),
    'b4': ((64, 128, 320, 512), (3, 8, 27, 3)),
    'b5': ((64, 128, 320, 512), (3, 6, 40, 3)),
}


def mit_variant_name(name: str, default: str | None = None) -> str:
    """Canonical 'b0'..'b5' from a short name or an HF-style model id
    (e.g. 'nvidia/segformer-b1-finetuned-ade-512-512', the reference's
    ``model_name`` parameter, model.py:91).

    With ``default``, an unrecognized id falls back to it with a warning
    instead of raising — the reference accepts arbitrary ``model_name``
    strings (custom fine-tune repo ids carry no bN token), so ids coming
    from that config key must not hard-fail. Explicit
    ``segformer_variant`` values stay strict (no ``default``)."""
    key = name.strip().lower()
    if key not in MIT_VARIANTS:
        import re
        m = re.search(r'\bmit-(b[0-5])\b|segformer-(b[0-5])\b', key)
        if m:
            key = m.group(1) or m.group(2)
    if key not in MIT_VARIANTS:
        if default is not None:
            import logging
            logging.getLogger(__name__).warning(
                f'model_name {name!r} carries no recognizable MiT variant '
                f'token; using {default!r} geometry (reference accepts '
                f'arbitrary ids, model.py:91)')
            return default
        raise ValueError(
            f'unknown MiT variant {name!r}; expected one of '
            f'{sorted(MIT_VARIANTS)} or an HF segformer-bN model id')
    return key


def mit_variant_config(name: str, default: str | None = None
                       ) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """(hidden_sizes, depths) for a MiT variant name or HF model id."""
    return MIT_VARIANTS[mit_variant_name(name, default=default)]


class OverlapPatchEmbed(nn.Module):
    features: int
    patch_size: int
    stride: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.patch_size // 2
        x = nn.Conv(self.features, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)])(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        return x


class EfficientSelfAttention(nn.Module):
    """Spatial-reduction attention (SegFormer §3.1).

    K/V tokens are downsampled by a strided conv of factor ``sr_ratio``
    before attention, so the score matrix is [N, N/sr²] — this is how the
    reference handles megapixel token counts (SURVEY.md §5 long-context).
    """

    dim: int
    num_heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x: jax.Array, hw: tuple[int, int],
                 tile_info=None) -> jax.Array:
        b, n, c = x.shape
        h, w = hw
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        q = nn.Dense(self.dim, kernel_init=trunc02)(x)

        # Under spatial tiling (tile_info set; parallel/collectives.TileInfo)
        # K/V come from the ASSEMBLED full-image feature map — each tile
        # attends over exactly the token set the monolithic forward would
        # see, which is what makes tiled eval bit-exact (the reduced KV is
        # ≤2048 tokens, so the gather is tiny).
        kv_src = x
        kv_b = b
        if tile_info is not None:
            full = tile_info.assemble_full(x.reshape(b, h, w, c))
            kv_src = full.reshape(1, -1, c)
            kv_b = 1
            fh, fw = full.shape[1], full.shape[2]
        else:
            fh, fw = h, w

        kv_in = kv_src
        if self.sr_ratio > 1:
            xs = kv_src.reshape(kv_b, fh, fw, c)
            xs = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                         strides=(self.sr_ratio, self.sr_ratio))(xs)
            kv_in = xs.reshape(kv_b, -1, c)
            kv_in = nn.LayerNorm(epsilon=1e-6)(kv_in)

        k = nn.Dense(self.dim, kernel_init=trunc02)(kv_in)
        v = nn.Dense(self.dim, kernel_init=trunc02)(kv_in)
        if tile_info is not None:  # share the full-image KV across tiles
            k = jnp.broadcast_to(k, (b,) + k.shape[1:])
            v = jnp.broadcast_to(v, (b,) + v.shape[1:])

        m = k.shape[1]
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = k.reshape(b, m, self.num_heads, head_dim)
        v = v.reshape(b, m, self.num_heads, head_dim)

        from ..ops.attention import pallas_attention_available, sr_attention
        if pallas_attention_available() and m <= 4096:
            # VMEM-resident-score kernel: the f32 [B, h, N, M] score tensor
            # (537 MB at stage 1 for 512×1024 inputs) never touches HBM.
            qg = q.transpose(0, 2, 1, 3).reshape(b * self.num_heads, n,
                                                 head_dim)
            kg = k.transpose(0, 2, 1, 3).reshape(b * self.num_heads, m,
                                                 head_dim)
            vg = v.transpose(0, 2, 1, 3).reshape(b * self.num_heads, m,
                                                 head_dim)
            out = sr_attention(qg, kg, vg, scale)
            out = out.reshape(b, self.num_heads, n, head_dim).transpose(
                0, 2, 1, 3).reshape(b, n, self.dim)
        else:
            # bnhd einsum path: contracts in place without head transposes
            # (odd head counts tile poorly), f32 scores via XLA.
            attn = jnp.einsum('bnhd,bmhd->bhnm', q, k,
                              preferred_element_type=jnp.float32) * scale
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            out = jnp.einsum('bhnm,bmhd->bnhd', attn, v).reshape(b, n,
                                                                 self.dim)
        return nn.Dense(self.dim, kernel_init=trunc02)(out)


class MixFFN(nn.Module):
    """FFN with 3×3 depthwise conv between the dense layers (Mix-FFN)."""

    dim: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, hw: tuple[int, int]) -> jax.Array:
        b, n, c = x.shape
        h, w = hw
        hidden = self.dim * self.mlp_ratio
        x = nn.Dense(hidden, kernel_init=trunc02)(x)
        xs = x.reshape(b, h, w, hidden)
        xs = nn.Conv(hidden, (3, 3), padding='SAME',
                     feature_group_count=hidden)(xs)  # depthwise
        x = xs.reshape(b, n, hidden)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, kernel_init=trunc02)(x)
        return x


class SegFormerBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, hw: tuple[int, int],
                 tile_info=None) -> jax.Array:
        x = x + EfficientSelfAttention(self.dim, self.num_heads, self.sr_ratio)(
            nn.LayerNorm(epsilon=1e-6)(x), hw, tile_info)
        x = x + MixFFN(self.dim, self.mlp_ratio)(
            nn.LayerNorm(epsilon=1e-6)(x), hw)
        return x


class MiTEncoder(nn.Module):
    """Mix Transformer encoder (B0 defaults per reference model.py:120-130)."""

    hidden_sizes: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    strides: Sequence[int] = (4, 2, 2, 2)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    remat: bool = False  # checkpoint each block: trade FLOPs for activation
    #                      memory in training (enables larger train batches)

    @nn.compact
    def __call__(self, x: jax.Array, tile_info=None) -> list[jax.Array]:
        """[B, H, W, 3] → list of 4 stage features [B, H/2^{i+2}, W/2^{i+2}, C_i]."""
        # Explicit names reproduce the auto-naming of the untransformed
        # class, so the variable tree (and checkpoints/converters) is
        # identical with remat on or off — nn.remat would otherwise scope
        # params under 'CheckpointSegFormerBlock_N'.
        block_cls = (nn.remat(SegFormerBlock, static_argnums=(2, 3))
                     if self.remat else SegFormerBlock)
        features = []
        blk = 0
        for i in range(len(self.hidden_sizes)):
            x = OverlapPatchEmbed(self.hidden_sizes[i], self.patch_sizes[i],
                                  self.strides[i])(x)
            b, h, w, c = x.shape
            tokens = x.reshape(b, h * w, c)
            for _ in range(self.depths[i]):
                tokens = block_cls(self.hidden_sizes[i], self.num_heads[i],
                                   self.sr_ratios[i], self.mlp_ratios[i],
                                   name=f'SegFormerBlock_{blk}')(
                    tokens, (h, w), tile_info)
                blk += 1
            tokens = nn.LayerNorm(epsilon=1e-6)(tokens)
            x = tokens.reshape(b, h, w, c)
            if tile_info is not None:
                # halo resync at each stage boundary: per-segment local
                # receptive radius (≤ ~80 input px for B0) stays within the
                # halo, making tiled inference bit-exact
                x = tile_info.resync(x)
            features.append(x)
        return features


class SegFormerModel(nn.Module):
    """SegFormer with segmentation + optional depth head (model.py:81-223).

    Returns {'segmentation': [B, H, W, num_classes], 'depth': [B, H, W, 1]}
    (NHWC; the reference returns NCHW).
    """

    num_classes: int = 19
    include_depth: bool = True
    head_mode: str = 'faithful'   # 'faithful' (upsample feats → heads) | 'fused'
    fused_upsample: bool = True   # faithful path: collapse upsample into conv1
    hidden_sizes: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (2, 2, 2, 2)
    remat: bool = False           # checkpoint encoder blocks (training memory)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 tile_info=None) -> Dict[str, jax.Array]:
        h, w = x.shape[1], x.shape[2]
        features = MiTEncoder(hidden_sizes=tuple(self.hidden_sizes),
                              depths=tuple(self.depths),
                              remat=self.remat and train)(x, tile_info)
        feat = features[-1]  # last hidden state, as model.py:193-207

        if self.head_mode == 'faithful':
            # upsample features to input res before heads (model.py:209-211).
            # When the upsample is an integer ×scale (the normal case: the
            # encoder downsamples by exactly 32), the heads fuse it into
            # their first conv (ops/upconv.py) — same function, the
            # full-res conv's FLOPs collapse; otherwise fall back to the
            # literal materialize-then-conv composition.
            fh, fw = feat.shape[1], feat.shape[2]
            scale = h // fh if fh else 0
            use_fused = (self.fused_upsample and scale >= 4
                         and h == fh * scale and w == fw * scale)
            up_scale = scale if use_fused else None
            if not use_fused:
                feat = upsample_like(feat, (h, w))
            seg = SegmentationHead(self.num_classes)(
                feat, train, upsample_scale=up_scale)
            results = {'segmentation': seg}
            if self.include_depth:
                results['depth'] = DepthEstimationHead(hidden_channels=128)(
                    feat, train, upsample_scale=up_scale)
        else:
            seg = SegmentationHead(self.num_classes)(feat, train)
            results = {'segmentation': upsample_like(seg, (h, w))}
            if self.include_depth:
                depth = DepthEstimationHead(hidden_channels=128)(feat, train)
                results['depth'] = upsample_like(depth, (h, w))
        return results
