"""WeatherAugmentationPipeline + style transfer tests (loader.py:296-387)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awsegbench.weather.augmentation import (WeatherAugmentationPipeline,
                                             convert_scale_abs,
                                             style_transfer)


class TestConvertScaleAbs:
    def test_matches_cv2(self, tiny_image):
        cv2 = pytest.importorskip('cv2')
        for alpha, beta in [(0.8, 30), (1.2, -10), (0.4, -20)]:
            ref = cv2.convertScaleAbs(tiny_image, alpha=alpha, beta=beta)
            ours = np.asarray(convert_scale_abs(jnp.asarray(tiny_image),
                                                alpha, beta))
            assert np.abs(ref.astype(int) - ours.astype(int)).max() <= 1


class TestStyleTransfer:
    @pytest.mark.parametrize('weather', ['fog', 'rain', 'snow', 'night'])
    def test_changes_image(self, tiny_image, weather):
        out = np.asarray(style_transfer(jnp.asarray(tiny_image), weather))
        assert out.shape == tiny_image.shape
        assert out.dtype == np.uint8
        assert not np.array_equal(out, tiny_image)

    def test_unknown_weather_passthrough(self, tiny_image):
        out = np.asarray(style_transfer(jnp.asarray(tiny_image), 'clean'))
        assert np.array_equal(out, tiny_image)


class TestPipeline:
    def test_default_intensities(self):
        p = WeatherAugmentationPipeline()
        assert p.weather_intensities == {'fog': 0.7, 'rain': 0.5,
                                         'snow': 0.6, 'night': 0.8}
        assert p.style_transfer_prob == 0.3

    def test_augmentation_applies(self, tiny_image):
        p = WeatherAugmentationPipeline()
        out = np.asarray(p.apply_domain_adaptation_augmentation(
            jnp.asarray(tiny_image), jax.random.PRNGKey(0),
            target_weather='fog'))
        assert out.shape == tiny_image.shape
        assert out.dtype == np.uint8
        assert not np.array_equal(out, tiny_image)

    def test_random_weather_pick(self, tiny_image):
        p = WeatherAugmentationPipeline()
        outs = {np.asarray(p.apply_domain_adaptation_augmentation(
            jnp.asarray(tiny_image), jax.random.PRNGKey(i))).tobytes()
            for i in range(6)}
        assert len(outs) > 1  # different weathers/keys give different results

    def test_jittable_random_pick(self, tiny_image):
        """The facade must be jittable even with target_weather=None
        (the weather pick is an on-device lax.switch, no host sync) and
        bit-match the eager path per key."""
        p = WeatherAugmentationPipeline()
        f = jax.jit(lambda img, k:
                    p.apply_domain_adaptation_augmentation(img, k))
        for i in range(4):
            key = jax.random.PRNGKey(i)
            eager = np.asarray(p.apply_domain_adaptation_augmentation(
                jnp.asarray(tiny_image), key))
            jitted = np.asarray(f(jnp.asarray(tiny_image), key))
            np.testing.assert_array_equal(jitted, eager)
