"""Weather corruption engine tests + golden parity vs the reference formulas.

Mirrors reference tests/test_data.py:140-265 (shape/dtype/range preservation,
clean bit-exact passthrough, invalid weather raises, fog-density range,
depth range/disparity) and adds exact-formula golden checks against the
reference implementation loaded directly from /root/reference (deterministic
components only — stochastic rasterization is checked at distribution level,
see SURVEY.md §7 'Hard parts').
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awsegbench.weather.corruption import (WEATHER_IDS,
                                           apply_weather_effect,
                                           corrupt_batch,
                                           corrupt_batch_static,
                                           fog_density_map, synthetic_depth)
from awsegbench.weather.depth import (depth_to_disparity, estimate_depth,
                                      estimate_depth_batch,
                                      preprocess_depth_for_training)

KEY = jax.random.PRNGKey(0)


def _load_reference_preprocessing():
    spec = importlib.util.spec_from_file_location(
        'ref_preproc',
        '/root/reference/src/adverse_weather_semantic_segmentation_robustness_benchmark/'
        'data/preprocessing.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestCorruptions:
    def test_clean_passthrough_bit_exact(self, tiny_image):
        out = apply_weather_effect(jnp.asarray(tiny_image), 'clean', KEY)
        assert np.array_equal(np.asarray(out), tiny_image)

    @pytest.mark.parametrize('weather', ['fog', 'rain', 'snow', 'night'])
    def test_shape_dtype_range(self, tiny_image, weather):
        out = np.asarray(apply_weather_effect(jnp.asarray(tiny_image),
                                              weather, KEY))
        assert out.shape == tiny_image.shape
        assert out.dtype == np.uint8
        assert not np.array_equal(out, tiny_image)

    def test_invalid_weather_raises(self, tiny_image):
        with pytest.raises(ValueError):
            apply_weather_effect(jnp.asarray(tiny_image), 'tornado', KEY)

    def test_seeded_reproducibility(self, tiny_image):
        a = np.asarray(apply_weather_effect(jnp.asarray(tiny_image), 'rain', KEY))
        b = np.asarray(apply_weather_effect(jnp.asarray(tiny_image), 'rain', KEY))
        assert np.array_equal(a, b)

    def test_batch_mixed_weather(self, tiny_batch):
        keys = jax.random.split(KEY, 4)
        out = np.asarray(corrupt_batch(jnp.asarray(tiny_batch['image']),
                                       jnp.asarray(tiny_batch['weather_id']),
                                       keys))
        assert out.shape == tiny_batch['image'].shape
        assert out.dtype == np.uint8
        # clean sample (id 0) must pass through bit-exact
        assert np.array_equal(out[0], tiny_batch['image'][0])
        # corrupted samples must differ
        for i in range(1, 4):
            assert not np.array_equal(out[i], tiny_batch['image'][i])

    def test_static_matches_mixed_dispatch(self, tiny_batch):
        """The static-weather fast path must equal the fused mixed path.

        Tolerance: ≤1 uint8 LSB. The two paths are separately compiled XLA
        programs; the blur's shifted-multiply-add chain (ops/filters.py) is
        subject to context-dependent FMA contraction, so float values can
        differ by ~1 ulp — and the uint8 quantization *truncates*, so any
        constant-color region whose blurred value lands exactly on an
        integer (e.g. rain-splat color 1.0 → 255, saturated sky) flips by
        one LSB across the whole region. Structure and parameters are
        identical (same per-sample key splits); differences are bounded by
        one quantization step.
        """
        keys = jax.random.split(KEY, 4)
        imgs = jnp.asarray(tiny_batch['image'])
        for weather in ['fog', 'rain', 'snow', 'night']:
            wid = jnp.full((4,), WEATHER_IDS[weather], jnp.int32)
            mixed = np.asarray(corrupt_batch(imgs, wid, keys)).astype(np.int16)
            static = np.asarray(
                corrupt_batch_static(imgs, weather, keys)).astype(np.int16)
            diff = np.abs(mixed - static)
            assert diff.max() <= 1, (weather, diff.max())


class TestGoldenParity:
    """Exact-formula parity vs the reference implementation."""

    def test_fog_formula_pinned_depth(self, tiny_image):
        ref = _load_reference_preprocessing()
        h, w = tiny_image.shape[:2]
        depth = np.random.rand(h, w) * 50 + 1
        wt = ref.WeatherDegradationTransforms(seed=1)
        wt._generate_synthetic_depth = lambda hh, ww: depth
        intensity = 0.6
        ref_out = wt._apply_fog((tiny_image / 255.0).astype(np.float32),
                                intensity=intensity)
        beta = 0.005 + intensity * 0.045
        a = 0.7 + intensity * 0.3
        t = np.exp(-beta * depth)[..., None]
        ours = (np.clip(tiny_image / 255.0 * t + a * (1 - t), 0, 1) * 255
                ).astype(np.uint8)
        assert np.abs(ref_out.astype(int) - ours.astype(int)).max() <= 1

    def test_depth_estimator_parity(self, tiny_image):
        ref = _load_reference_preprocessing()
        ref_d = ref.DepthEstimationPreprocessor().estimate_depth(tiny_image)
        ours = np.asarray(estimate_depth(jnp.asarray(tiny_image)))
        assert np.abs(ref_d - ours).max() < 1e-3

    def test_fog_density_map_parity(self, tiny_image):
        ref = _load_reference_preprocessing()
        h, w = tiny_image.shape[:2]
        depth = (np.random.rand(h, w) * 50 + 1).astype(np.float32)
        wt = ref.WeatherDegradationTransforms(seed=0)
        ref_fd = wt.get_fog_density_map(tiny_image / 255.0, depth)
        ours = np.asarray(fog_density_map(jnp.asarray(tiny_image), KEY,
                                          jnp.asarray(depth)))
        err = np.abs(ref_fd - ours)
        # max 2e-3 tolerance: cv2 5.x's SIMD RGB2GRAY differs by ±1 LSB on
        # ~0.1% of pixels vs its own documented fixed-point formula
        assert err.max() < 2e-3
        assert np.percentile(err, 99) < 1e-3

    def test_synthetic_depth_statistics(self):
        """Distribution-level parity: vertical gradient ×100, σ=2 smoothing,
        floor at 1.0 (preprocessing.py:227-248)."""
        d = np.asarray(synthetic_depth(KEY, 64, 96))
        assert d.min() >= 1.0
        # top rows near 1 (clamped), bottom rows near 100
        assert d[-1].mean() > 80
        assert d[0].mean() < 20

    def test_night_fixed_brightness_statistics(self, tiny_image):
        """Night at intensity=0: pure channel shift only."""
        out = np.asarray(apply_weather_effect(jnp.asarray(tiny_image),
                                              'night', KEY, intensity=0.0))
        expected = np.clip(tiny_image / 255.0 *
                           np.array([0.8, 0.85, 1.2]), 0, 1)
        # brightness factor is 1 - 0·U = 1; noise scaled by 0 intensity
        expected = (expected * 255).astype(np.uint8)
        assert np.abs(out.astype(int) - expected.astype(int)).max() <= 1


class TestRainSnowDistribution:
    """Stochastic splats: distribution-level checks."""

    def test_rain_adds_bright_streaks(self, tiny_image):
        dark = (tiny_image * 0.2).astype(np.uint8)
        out = np.asarray(apply_weather_effect(jnp.asarray(dark), 'rain', KEY,
                                              intensity=0.8))
        # rain color [0.8, 0.9, 1.0] is bright: mean must rise
        assert out.mean() > dark.mean()

    def test_snow_brightens(self, tiny_image):
        out = np.asarray(apply_weather_effect(jnp.asarray(tiny_image),
                                              'snow', KEY, intensity=0.7))
        assert out.astype(np.int64).mean() > tiny_image.astype(np.int64).mean()

    def test_night_darkens(self, tiny_image):
        out = np.asarray(apply_weather_effect(jnp.asarray(tiny_image),
                                              'night', KEY, intensity=0.8))
        assert out.astype(np.int64).mean() < tiny_image.astype(np.int64).mean()


class TestDepthPreprocessor:
    def test_depth_range(self, tiny_image):
        d = np.asarray(estimate_depth(jnp.asarray(tiny_image)))
        assert d.shape == tiny_image.shape[:2]
        assert d.min() >= 0.0 and d.max() <= 1.0

    def test_batched(self, tiny_batch):
        d = np.asarray(estimate_depth_batch(jnp.asarray(tiny_batch['image'])))
        assert d.shape == tiny_batch['image'].shape[:3]

    def test_disparity_positive(self, tiny_image):
        d = estimate_depth(jnp.asarray(tiny_image))
        disp = np.asarray(depth_to_disparity(d))
        assert (disp > 0).all()

    def test_preprocess_for_training(self):
        depth = jnp.asarray(np.random.rand(32, 48).astype(np.float32) * 10)
        out = np.asarray(preprocess_depth_for_training(depth, (16, 24)))
        assert out.shape == (16, 24)
        assert out.min() >= 0 and out.max() <= 1.0 + 1e-6
