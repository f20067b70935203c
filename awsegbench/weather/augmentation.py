"""Domain-adaptation weather augmentation pipeline.

JAX port of the reference ``WeatherAugmentationPipeline``
(loader.py:296-387): fixed per-weather intensities, corruption, then
probabilistic "style transfer" = convertScaleAbs contrast/brightness plus
per-weather channel tints — all on-device and batched.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .corruption import apply_weather_effect

DEFAULT_INTENSITIES = {'fog': 0.7, 'rain': 0.5, 'snow': 0.6, 'night': 0.8}


def convert_scale_abs(image_u8: jax.Array, alpha: float, beta: float) -> jax.Array:
    """cv2.convertScaleAbs: saturate_cast<uint8>(round(|alpha·x + beta|))."""
    y = jnp.abs(alpha * image_u8.astype(jnp.float32) + beta)
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


def style_transfer(image_u8: jax.Array, weather_type: str) -> jax.Array:
    """Per-weather color-space style shift (loader.py:360-387)."""
    if weather_type == 'fog':
        return convert_scale_abs(image_u8, 0.8, 30)
    if weather_type == 'rain':
        img = convert_scale_abs(image_u8, 1.2, -10)
        b = jnp.clip(img[..., 2].astype(jnp.float32) * 1.1, 0, 255).astype(jnp.uint8)
        return img.at[..., 2].set(b)
    if weather_type == 'snow':
        return convert_scale_abs(image_u8, 0.9, 20)
    if weather_type == 'night':
        img = convert_scale_abs(image_u8, 0.4, -20)
        b = jnp.clip(img[..., 2].astype(jnp.float32) * 1.3, 0, 255).astype(jnp.uint8)
        return img.at[..., 2].set(b)
    return image_u8


class WeatherAugmentationPipeline:
    """Same public surface as the reference class (loader.py:296-358)."""

    def __init__(self,
                 weather_intensities: Optional[Dict[str, float]] = None,
                 style_transfer_prob: float = 0.3,
                 **kwargs) -> None:
        self.weather_intensities = weather_intensities or dict(DEFAULT_INTENSITIES)
        self.style_transfer_prob = style_transfer_prob

    def apply_domain_adaptation_augmentation(
            self, image_u8: jax.Array, key: jax.Array,
            target_weather: Optional[str] = None) -> jax.Array:
        """Corrupt at the fixed intensity, then style-transfer with prob p.

        Fully jittable: with ``target_weather=None`` the uniform weather
        pick (loader.py:331) runs as an on-device ``lax.switch`` over the
        per-weather branches — no host sync; the ``randint`` draw (and so
        the chosen weather per key) is identical to the former eager path.
        """
        k_pick, k_weather, k_style = jax.random.split(key, 3)
        do_style = jax.random.uniform(k_style, ()) < self.style_transfer_prob

        def branch(name: str):
            def f(img, kw):
                aug = apply_weather_effect(
                    img, name, kw, intensity=self.weather_intensities[name])
                return jnp.where(do_style, style_transfer(aug, name), aug)
            return f

        if target_weather is not None:
            return branch(target_weather)(image_u8, k_weather)
        names = list(self.weather_intensities.keys())
        idx = jax.random.randint(k_pick, (), 0, len(names))
        return jax.lax.switch(idx, [branch(n) for n in names],
                              image_u8, k_weather)
