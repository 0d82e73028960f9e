"""TensorBoard event writer round-trip: decode with the project's own
TFRecord reader + proto field iterator (CRC-verified framing, correct field
numbers per tensorflow's event.proto/summary.proto)."""

import struct

import numpy as np

from centerpose_tpu.data.tfrecord import _iter_fields, read_tfrecord
from centerpose_tpu.utils.tbevents import TBEventWriter


def _fields(buf):
    return {f: (w, v) for f, w, v in _iter_fields(buf)}


class TestTBEvents:
    def test_scalar_and_image_roundtrip(self, tmp_path):
        w = TBEventWriter(str(tmp_path))
        w.scalar("train/loss", 0.125, step=7)
        img = np.zeros((4, 6, 3), np.uint8)
        img[1, 2] = (255, 0, 0)
        w.image("debug/out_hm_pred", img, step=7)
        w.close()

        records = list(read_tfrecord(w.path, verify_crc=True))
        assert len(records) == 3  # file_version + scalar + image

        # Record 0: file_version = "brain.Event:2" (field 3).
        f0 = _fields(records[0])
        assert f0[3][1] == b"brain.Event:2"

        # Record 1: step (field 2) + summary (field 5) -> value -> tag/float.
        f1 = _fields(records[1])
        assert f1[2][1] == 7
        value = _fields(_fields(f1[5][1])[1][1])
        assert value[1][1] == b"train/loss"
        assert abs(struct.unpack("<f", value[2][1])[0] - 0.125) < 1e-9

        # Record 2: image summary with PNG payload and RGB colorspace.
        f2 = _fields(records[2])
        value = _fields(_fields(f2[5][1])[1][1])
        assert value[1][1] == b"debug/out_hm_pred"
        image = _fields(value[4][1])
        assert image[1][1] == 4 and image[2][1] == 6 and image[3][1] == 3
        assert image[4][1][:8] == b"\x89PNG\r\n\x1a\n"

        # And PIL can decode the PNG back to the pixel we set.
        import io

        from PIL import Image

        arr = np.asarray(Image.open(io.BytesIO(image[4][1])))
        assert tuple(arr[1, 2]) == (255, 0, 0)

    def test_logger_integration(self, tmp_path):
        from centerpose_tpu.utils.logger import Logger

        logger = Logger(str(tmp_path / "exp"))
        logger.scalars(1, {"loss": 2.0}, prefix="train_")
        logger.image(1, "debug/x", np.zeros((2, 2, 3), np.uint8))
        logger.close()
        import glob
        import os

        events = glob.glob(os.path.join(str(tmp_path / "exp"), "tb", "events.*"))
        assert len(events) == 1
        assert len(list(read_tfrecord(events[0], verify_crc=True))) == 3
