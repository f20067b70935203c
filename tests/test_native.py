"""Native C++ host library tests: PNG decode, resize, batch pack vs cv2."""

import numpy as np
import pytest

from awsegbench import native

cv2 = pytest.importorskip('cv2')

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


class TestPngDecode:
    def test_rgb_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (60, 90, 3), dtype=np.uint8)
        p = tmp_path / 'x.png'
        cv2.imwrite(str(p), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        ours = native.imread(str(p))
        assert np.array_equal(ours, img)

    def test_gray_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        lbl = rng.integers(0, 34, (60, 90), dtype=np.uint8)
        p = tmp_path / 'l.png'
        cv2.imwrite(str(p), lbl)
        assert np.array_equal(native.imread(str(p)), lbl)

    def test_compressible_image_exercises_filters(self, tmp_path):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (256, 512, 3), dtype=np.uint8)
        img[:, :256] = img[:, :1]  # constant runs → sub/up/paeth filters
        p = tmp_path / 'big.png'
        cv2.imwrite(str(p), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        assert np.array_equal(native.imread(str(p)), img)

    def test_invalid_returns_none(self):
        assert native.png_decode(b'not a png at all') is None


class TestResize:
    def test_bilinear_matches_cv2(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        ref = cv2.resize(img, (48, 32))
        ours = native.resize_u8(img, (32, 48))
        assert np.abs(ref.astype(int) - ours.astype(int)).max() <= 1

    def test_nearest_matches_cv2(self):
        rng = np.random.default_rng(4)
        lbl = rng.integers(0, 34, (64, 96), dtype=np.uint8)
        ref = cv2.resize(lbl, (48, 32), interpolation=cv2.INTER_NEAREST)
        ours = native.resize_u8(lbl, (32, 48), nearest=True)
        assert np.array_equal(ref, ours)

    def test_upscale(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
        ref = cv2.resize(img, (96, 64))
        ours = native.resize_u8(img, (64, 96))
        assert np.abs(ref.astype(int) - ours.astype(int)).max() <= 1


class TestPackBatch:
    def test_pack_matches_stack(self):
        rng = np.random.default_rng(6)
        items = [rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
                 for _ in range(7)]
        packed = native.pack_batch(items)
        assert np.array_equal(packed, np.stack(items))


class TestDatasetFallback:
    def test_dataset_decodes_via_native_without_cv2(self, tmp_path,
                                                    monkeypatch):
        """With cv2 'absent', the dataset reads real PNGs through the
        native decoder instead of falling back to random arrays."""
        img_dir = tmp_path / 'cityscapes/leftImg8bit/train/cityA'
        lbl_dir = tmp_path / 'cityscapes/gtFine/train/cityA'
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        rng = np.random.default_rng(7)
        img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        lbl = rng.integers(0, 19, (32, 48), dtype=np.uint8)
        cv2.imwrite(str(img_dir / 'a_leftImg8bit.png'),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(lbl_dir / 'a_gtFine_labelIds.png'), lbl)

        import awsegbench.data.dataset as ds_mod
        monkeypatch.setattr(ds_mod, '_CV2_AVAILABLE', False)
        ds = ds_mod.CityscapesKITTIDataset(str(tmp_path), split='train',
                                           image_size=(32, 48),
                                           dataset_type='cityscapes',
                                           weather_conditions=['clean'],
                                           seed=0)
        item = ds[0]
        assert np.array_equal(item['image'], img)
        assert np.array_equal(item['label'], lbl.astype(np.int32))
