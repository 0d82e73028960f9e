"""V4L2 webcam module tests — conversion math, struct layouts, gating.

The image has no /dev/video* node, so the ioctl path is covered by the
hardware gate test; the YUYV→RGB conversion and the (kernel-ABI-critical)
struct sizes are verified exactly.
"""

import ctypes

import numpy as np
import pytest

from centerpose_tpu.data import webcam as wc


class TestYUYV:
    def test_gray_roundtrip(self):
        # U = V = 128 means no chroma: RGB == Y.
        h, w = 4, 8
        y = np.arange(h * w, dtype=np.uint8).reshape(h, w) * 7
        frame = np.zeros((h, w, 2), np.uint8)
        frame[:, :, 0] = y
        frame[:, :, 1] = 128
        rgb = wc.yuyv_to_rgb(frame.tobytes(), w, h)
        assert rgb.shape == (h, w, 3)
        np.testing.assert_array_equal(rgb[:, :, 0], y)
        np.testing.assert_array_equal(rgb[:, :, 1], y)
        np.testing.assert_array_equal(rgb[:, :, 2], y)

    def test_chroma_bt601(self):
        # A single macropixel with known U/V: check BT.601 coefficients.
        h, w = 1, 2
        y0 = y1 = 100.0
        u, v = 200.0, 50.0
        frame = bytes(bytearray([int(y0), int(u), int(y1), int(v)]))
        rgb = wc.yuyv_to_rgb(frame, w, h).astype(np.float64)
        exp_r = np.clip(y0 + 1.402 * (v - 128), 0, 255)
        exp_g = np.clip(y0 - 0.344136 * (u - 128) - 0.714136 * (v - 128), 0, 255)
        exp_b = np.clip(y0 + 1.772 * (u - 128), 0, 255)
        assert abs(rgb[0, 0, 0] - exp_r) <= 1
        assert abs(rgb[0, 0, 1] - exp_g) <= 1
        assert abs(rgb[0, 0, 2] - exp_b) <= 1
        # both pixels of the macropixel share chroma
        np.testing.assert_array_equal(rgb[0, 0], rgb[0, 1])


class TestABI:
    def test_struct_sizes_match_kernel_abi(self):
        # linux/videodev2.h on 64-bit: these sizes are load-bearing for the
        # ioctl numbers (encoded in the request) and the memory layout.
        assert ctypes.sizeof(wc.v4l2_capability) == 104
        assert ctypes.sizeof(wc.v4l2_pix_format) == 48
        assert ctypes.sizeof(wc.v4l2_format) == 208
        assert ctypes.sizeof(wc.v4l2_requestbuffers) == 20
        assert ctypes.sizeof(wc.v4l2_buffer) == 88

    def test_ioctl_numbers(self):
        # Known-good request codes from a 64-bit videodev2.h build.
        assert wc.VIDIOC_QUERYCAP == 0x80685600
        assert wc.VIDIOC_S_FMT == 0xC0D05605
        assert wc.VIDIOC_QBUF == 0xC058560F
        assert wc.VIDIOC_DQBUF == 0xC0585611
        assert wc.VIDIOC_STREAMON == 0x40045612

    def test_fourcc(self):
        assert wc.V4L2_PIX_FMT_YUYV == 0x56595559


class TestGating:
    def test_missing_device_raises_clear_error(self, tmp_path):
        with pytest.raises(wc.WebcamUnavailable, match="not present"):
            wc.V4L2Camera(str(tmp_path / "video9"))
