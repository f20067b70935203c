"""Pallas splat kernel tests (interpret mode on CPU) + spatial tiling."""

import jax
import jax.numpy as jnp
import numpy as np

from awsegbench.ops.splat import pack_params, splat_coverage_pallas
from awsegbench.parallel.collectives import (spatial_tiles, stitch_tiles,
                                             tiled_forward)
from awsegbench.weather import corruption as C


def _random_capsules(n, h, w, seed=0, n_valid=None):
    rng = np.random.default_rng(seed)
    ax = rng.uniform(0, w, n).astype(np.float32)
    ay = rng.uniform(0, h, n).astype(np.float32)
    bx = np.clip(ax + rng.uniform(-20, 20, n), 0, w - 1).astype(np.float32)
    by = np.clip(ay + rng.uniform(-20, 20, n), 0, h - 1).astype(np.float32)
    r = rng.uniform(0.5, 4, n).astype(np.float32)
    valid = np.arange(n) < (n_valid if n_valid is not None else n)
    return ax, ay, bx, by, r, valid


class TestSplatKernel:
    def test_matches_xla_scan_path(self):
        h, w, n = 300, 600, 64
        ax, ay, bx, by, r, valid = _random_capsules(n, h, w, n_valid=50)
        params = pack_params(jnp.asarray(ax), jnp.asarray(ay),
                             jnp.asarray(bx), jnp.asarray(by),
                             jnp.asarray(r), jnp.asarray(valid))
        kernel = np.asarray(splat_coverage_pallas(params, h, w,
                                                  interpret=True)) > 0.5
        ref = np.asarray(C._segment_coverage(
            h, w, jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(bx),
            jnp.asarray(by), jnp.asarray(r), jnp.asarray(valid)))
        assert np.array_equal(kernel, ref)

    def test_invalid_drops_render_nothing(self):
        h, w, n = 64, 128, 16
        ax, ay, bx, by, r, valid = _random_capsules(n, h, w, n_valid=0)
        params = pack_params(jnp.asarray(ax), jnp.asarray(ay),
                             jnp.asarray(bx), jnp.asarray(by),
                             jnp.asarray(r), jnp.asarray(valid))
        mask = np.asarray(splat_coverage_pallas(params, h, w, interpret=True))
        assert mask.sum() == 0

    def test_point_circle(self):
        """Zero-length capsule = filled circle of the given radius."""
        params = pack_params(jnp.asarray([32.0]), jnp.asarray([16.0]),
                             jnp.asarray([32.0]), jnp.asarray([16.0]),
                             jnp.asarray([5.0]), jnp.asarray([True]))
        mask = np.asarray(splat_coverage_pallas(params, 64, 128,
                                                interpret=True)) > 0.5
        ys, xs = np.mgrid[:64, :128]
        expected = ((xs - 32.0) ** 2 + (ys - 16.0) ** 2) <= 25.0
        assert np.array_equal(mask, expected)


class TestBatchedSplatKernel:
    """v3 batched-grid kernel (one program per image, chunk-vectorized
    math) must be bit-identical to the XLA scan path."""

    def _run(self, b, h, w, n, n_valid, seed=0):
        from awsegbench.ops.splat import (prepare_splat_batch,
                                          splat_coverage_batched)
        caps = [_random_capsules(n, h, w, seed=seed + i, n_valid=n_valid)
                for i in range(b)]
        arrs = [jnp.asarray(np.stack([c[j] for c in caps]))
                for j in range(6)]
        ax, ay, bx, by, r, valid = arrs
        nv, params, winpos = jax.vmap(
            lambda a1, a2, b1, b2, rr, vv: prepare_splat_batch(
                a1, a2, b1, b2, rr, vv, h, w))(ax, ay, bx, by, r, valid)
        got = np.asarray(splat_coverage_batched(nv, params, winpos, h, w,
                                                interpret=True)) > 0.5
        ref = np.asarray(jax.vmap(
            lambda a1, a2, b1, b2, rr, vv: C._segment_coverage(
                h, w, a1, a2, b1, b2, rr, vv))(ax, ay, bx, by, r, valid))
        np.testing.assert_array_equal(got, ref)

    def test_matches_scan_small_batch(self):
        self._run(b=2, h=64, w=256, n=64, n_valid=50)

    def test_mixed_validity_and_chunk_boundary(self):
        # n_valid not a CHUNK multiple exercises the tail-predication path
        self._run(b=3, h=128, w=384, n=96, n_valid=33, seed=7)

    def test_zero_valid(self):
        self._run(b=2, h=64, w=256, n=16, n_valid=0, seed=3)


class TestSpatialTiling:
    def test_tiles_roundtrip_identity(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(size=(64, 128, 3)).astype(np.float32))
        tiles = spatial_tiles(img, 32, 64, halo=8)
        assert tiles.shape == (4, 48, 80, 3)
        back = stitch_tiles(tiles, 64, 128, 32, 64, halo=8)
        assert np.allclose(np.asarray(back), np.asarray(img))

    def test_tiled_forward_matches_monolithic_for_local_op(self):
        """A conv-like local op with receptive field ≤ halo stitches
        exactly."""
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.normal(size=(64, 128, 3)).astype(np.float32))
        kernel = jnp.asarray(rng.normal(size=(5, 5, 3, 4)).astype(np.float32))

        def conv(x):  # [*, H, W, 3] -> [*, H, W, 4], zero-pad SAME
            return jax.lax.conv_general_dilated(
                x, kernel, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        mono = conv(img[None])[0]
        tiled = tiled_forward(lambda v, t: conv(t), None, img,
                              tile_h=32, tile_w=64, halo=8, out_channels=4)
        # interior matches exactly; edges differ (halo uses edge-padding,
        # monolithic uses zero-padding)
        assert np.allclose(np.asarray(mono)[8:-8, 8:-8],
                           np.asarray(tiled)[8:-8, 8:-8], atol=1e-5)
