"""Tests for the facade's capture module (cv_tpu.video) — the counterpart
of the reference's ``cv::video`` re-export (cv/src/lib.rs:140-148)."""

from cv_tpu.utils.fixtures import fixture_path
import numpy as np
import pytest

from cv_tpu.video import CameraSource, ImageSequenceSource, VideoFileSource


class TestImageSequenceSource:
    def test_glob_kitti_pair(self):
        import os

        src = ImageSequenceSource(
            os.path.join(os.path.dirname(fixture_path("0000000000.png")), "*.png")
        )
        frames = list(src)
        assert len(src) == len(frames) == 2
        for f in frames:
            assert f.dtype == np.uint8
            assert f.shape == (512, 1392)  # the KITTI pair in res/

    def test_explicit_paths_keep_order(self):
        paths = [
            fixture_path("0000000014.png"),
            fixture_path("0000000000.png"),
        ]
        src = ImageSequenceSource(paths)
        assert [p.name for p in src.paths] == [
            "0000000014.png",
            "0000000000.png",
        ]


class TestVideoFileSource:
    def test_roundtrip(self, tmp_path):
        # GIF round-trips through imageio without an ffmpeg encoder; the
        # mp4 path is identical modulo the container plugin.
        iio = pytest.importorskip("imageio.v3")
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (6, 64, 96, 3), dtype=np.uint8)
        path = tmp_path / "clip.gif"
        try:
            iio.imwrite(path, frames, duration=100)
        except Exception as e:  # pragma: no cover - plugin-dependent
            pytest.skip(f"video encoding unavailable: {e}")
        got = list(VideoFileSource(path, step=2, limit=2))
        assert len(got) == 2
        for g in got:
            assert g.dtype == np.uint8 and g.shape == (64, 96)


class TestCameraSource:
    def test_missing_device_raises(self):
        pytest.importorskip("cv2")
        with pytest.raises(RuntimeError, match="camera"):
            CameraSource(device=99).open()

    def test_gray_conversion(self):
        from cv_tpu.video import _to_gray_u8

        rgb = np.zeros((4, 4, 3), np.uint8)
        rgb[..., 0] = 255  # pure red -> luma 76
        g = _to_gray_u8(rgb)
        assert g.shape == (4, 4) and int(g[0, 0]) == 76
