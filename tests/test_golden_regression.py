"""Fixed-seed golden regression pins for the corruption engine.

Summary statistics of corrupted outputs under pinned PRNG keys are frozen
here; a change in any corruption formula, parameter table, key-split
layout, or quantization behavior shifts these values. Tolerances are tight
enough to catch semantic drift but loose enough to survive backend
reorderings (fp32 ulp noise through convs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awsegbench.weather.corruption import (apply_weather_effect,
                                           fog_density_map, synthetic_depth)
from awsegbench.weather.depth import estimate_depth


def _fixed_image(h=64, w=96):
    rng = np.random.default_rng(1234)
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


KEY = jax.random.PRNGKey(2024)

# frozen (mean, std) of uint8 outputs for the pinned image/key, intensity .5
GOLDEN = {
    'fog': (185.47, 39.04),
    'rain': (198.28, 47.39),
    'snow': (241.70, 30.66),
    'night': (102.17, 63.26),
}


@pytest.fixture(scope='module')
def stats():
    img = _fixed_image()
    out = {}
    for i, weather in enumerate(['fog', 'rain', 'snow', 'night']):
        y = np.asarray(apply_weather_effect(
            jnp.asarray(img), weather, jax.random.fold_in(KEY, i),
            intensity=0.5)).astype(np.float64)
        out[weather] = (y.mean(), y.std())
    return out


@pytest.mark.parametrize('weather', ['fog', 'rain', 'snow', 'night'])
def test_corruption_statistics_pinned(stats, weather):
    mean, std = stats[weather]
    gmean, gstd = GOLDEN[weather]
    assert abs(mean - gmean) < 0.5, (weather, mean, gmean)
    assert abs(std - gstd) < 0.5, (weather, std, gstd)


def test_synthetic_depth_pinned():
    d = np.asarray(synthetic_depth(KEY, 64, 96))
    assert abs(float(d.mean()) - 49.26) < 0.5
    assert abs(float(d.max()) - 101.0) < 1.0


def test_depth_estimate_pinned():
    d = np.asarray(estimate_depth(jnp.asarray(_fixed_image())))
    assert abs(float(d.mean()) - 0.5407) < 0.005


def test_fog_density_pinned():
    img = _fixed_image()
    fd = np.asarray(fog_density_map(jnp.asarray(img), KEY))
    assert abs(float(fd.mean()) - 0.1089) < 0.005
