"""Sequence .pbdata parser tests with a test-local protobuf encoder."""

import struct

import numpy as np
import pytest

from centerpose_tpu.data.objectron_pb import frame_to_ndds_dict, parse_sequence
from tests.test_tfrecord import _field, _len_field, _varint


def _f32(num, values):
    """Packed float field."""
    return _len_field(num, b"".join(struct.pack("<f", float(v)) for v in values))


def _point(num, xyz):
    body = b"".join(_field(i + 1, 5, struct.pack("<f", float(v)))
                    for i, v in enumerate(xyz))
    return _len_field(num, body)


def _make_sequence():
    rng = np.random.RandomState(0)
    rot = np.eye(3).ravel()
    obj = (
        _field(1, 0, _varint(0))
        + _len_field(2, b"shoe")
        + _f32(4, rot)
        + _f32(5, [0.1, -0.2, 1.0])
        + _f32(6, [0.1, 0.1, 0.25])
    )

    kps = b""
    pts2d = rng.rand(9, 2)
    pts3d = rng.rand(9, 3)
    for i in range(9):
        kp = (
            _field(1, 0, _varint(i))
            + _point(2, pts3d[i])
            + _point(3, list(pts2d[i]) + [1.0])
        )
        kps += _len_field(2, kp)
    ann = _field(1, 0, _varint(0)) + kps + _field(3, 5, struct.pack("<f", 0.9))

    cam = (
        _f32(3, np.eye(4).ravel())
        + _field(5, 0, _varint(1920))
        + _field(6, 0, _varint(1440))
        + _f32(7, [1500.0, 0, 960, 0, 1500.0, 720, 0, 0, 1])
        + _f32(8, np.eye(4).ravel())
        + _f32(9, np.eye(4).ravel())
    )
    frame = (
        _field(1, 0, _varint(0))
        + _len_field(2, ann)
        + _len_field(3, cam)
        + _f32(5, [0, -0.1, 1.0])
        + _f32(6, [0, 1.0, 0])
    )
    return _len_field(1, obj) + _len_field(2, frame), pts2d, pts3d


class TestSequenceParser:
    def test_parse_sequence(self):
        data, pts2d, pts3d = _make_sequence()
        seq = parse_sequence(data)
        assert len(seq["objects"]) == 1
        assert len(seq["frame_annotations"]) == 1
        obj = seq["objects"][0]
        assert obj["category"] == "shoe"
        np.testing.assert_allclose(obj["scale"], [0.1, 0.1, 0.25], atol=1e-6)
        np.testing.assert_allclose(obj["rotation"], np.eye(3))

        fr = seq["frame_annotations"][0]
        assert fr["camera"]["image_resolution_width"] == 1920
        assert len(fr["annotations"][0]["keypoints"]) == 9
        np.testing.assert_allclose(
            fr["annotations"][0]["keypoints"][3]["point_2d"][:2], pts2d[3],
            atol=1e-6,
        )
        assert fr["annotations"][0]["visibility"] == pytest.approx(0.9)
        np.testing.assert_allclose(fr["plane_normal"], [0, 1, 0])

    def test_frame_to_ndds(self):
        data, pts2d, pts3d = _make_sequence()
        seq = parse_sequence(data)
        rec = frame_to_ndds_dict(seq, 0, resolution_ratio=2.4)
        assert rec["camera_data"]["width"] == int(1440 / 2.4)
        assert rec["camera_data"]["height"] == int(1920 / 2.4)
        obj = rec["objects"][0]
        assert obj["name"].startswith("shoe")
        assert len(obj["projected_cuboid"]) == 9
        np.testing.assert_allclose(obj["scale"], [0.1, 0.1, 0.25], atol=1e-6)
        np.testing.assert_allclose(obj["location"], [0.1, -0.2, 1.0], atol=1e-6)
        assert "AR_data" in rec
