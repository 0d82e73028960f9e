"""TFRecord/tf.Example wire-format reader tests (with a test-local encoder)."""

import struct

import numpy as np
import pytest

from centerpose_tpu.data.tfrecord import (
    _crc32c,
    _masked_crc,
    parse_example,
    parse_objectron_example,
    read_tfrecord,
)


# ----------------------------------------------------------- test-side encoder
def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wtype: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wtype) + payload


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def _float_list(values) -> bytes:
    packed = b"".join(struct.pack("<f", float(v)) for v in values)
    return _len_field(1, packed)  # packed floats in field 1


def _int64_list(values) -> bytes:
    packed = b"".join(_varint(int(v)) for v in values)
    return _len_field(1, packed)


def _bytes_list(values) -> bytes:
    return b"".join(_len_field(1, v) for v in values)


def _feature(kind: str, values) -> bytes:
    if kind == "bytes":
        return _len_field(1, _bytes_list(values))
    if kind == "float":
        return _len_field(2, _float_list(values))
    return _len_field(3, _int64_list(values))


def make_example(features: dict) -> bytes:
    entries = b""
    for key, (kind, values) in features.items():
        entry = _len_field(1, key.encode()) + _len_field(2, _feature(kind, values))
        entries += _len_field(1, entry)
    return _len_field(1, entries)  # Example.features


def write_tfrecord(path, payloads):
    with open(path, "wb") as f:
        for data in payloads:
            header = struct.pack("<Q", len(data))
            f.write(header)
            f.write(struct.pack("<I", _masked_crc(header)))
            f.write(data)
            f.write(struct.pack("<I", _masked_crc(data)))


class TestWireFormat:
    def test_crc32c_known_vector(self):
        assert _crc32c(b"123456789") == 0xE3069283

    def test_record_roundtrip(self, tmp_path):
        p = str(tmp_path / "t.tfrecord")
        payloads = [b"hello", b"world" * 100]
        write_tfrecord(p, payloads)
        got = list(read_tfrecord(p, verify_crc=True))
        assert got == payloads

    def test_example_roundtrip(self):
        buf = make_example(
            {
                "name": ("bytes", [b"abc"]),
                "vals": ("float", [1.5, -2.25]),
                "ids": ("int64", [7, 300]),
            }
        )
        fm = parse_example(buf)
        assert fm["name"].bytes_list == [b"abc"]
        assert fm["vals"].float_list == pytest.approx([1.5, -2.25])
        assert fm["ids"].int64_list == [7, 300]


class TestObjectronExample:
    def test_parse_objectron_fields(self):
        pts2d = np.random.RandomState(0).rand(9, 3)
        pts3d = np.random.RandomState(1).rand(9, 3)
        buf = make_example(
            {
                "image/encoded": ("bytes", [b"\x89PNGfake"]),
                "image/id": ("int64", [42]),
                "instance_num": ("int64", [1]),
                "point_num": ("int64", [9]),
                "point_2d": ("float", pts2d.ravel().tolist()),
                "point_3d": ("float", pts3d.ravel().tolist()),
                "object/scale": ("float", [0.1, 0.2, 0.3]),
                "object/translation": ("float", [0.0, 0.0, 1.0]),
                "object/orientation": ("float", np.eye(3).ravel().tolist()),
                "object/visibility": ("float", [1.0]),
                "camera/projection": ("float", np.eye(4).ravel().tolist()),
                "plane/center": ("float", [0, 0, 0]),
                "plane/normal": ("float", [0, 1, 0]),
            }
        )
        out = parse_objectron_example(buf)
        assert out["image_id"] == 42
        assert out["num_instances"] == 1
        np.testing.assert_allclose(out["points_2d"][0], pts2d[:, :2], atol=1e-6)
        np.testing.assert_allclose(out["points_3d"][0], pts3d, atol=1e-6)
        np.testing.assert_allclose(out["scales"][0], [0.1, 0.2, 0.3], atol=1e-7)
        np.testing.assert_allclose(out["rotations"][0], np.eye(3))
        assert out["plane"][1][1] == 1.0
        assert out["image_bytes"].startswith(b"\x89PNG")
