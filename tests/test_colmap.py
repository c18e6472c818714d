"""COLMAP loader: synthetic text + binary models round-trip."""

import struct

import numpy as np

from gsgen_tpu.data.colmap import load_colmap


def write_text_model(d):
    (d / "cameras.txt").write_text(
        "# cameras\n1 PINHOLE 640 480 500.0 500.0 320.0 240.0\n")
    (d / "images.txt").write_text(
        "# images\n"
        "1 1 0 0 0 0.0 0.0 2.0 1 a.png\n"
        "1 2\n"
        "2 0.7071068 0 0.7071068 0 1.0 0.0 3.0 1 b.png\n"
        "3 4\n")
    (d / "points3D.txt").write_text(
        "# points\n"
        "1 0.5 0.5 0.5 255 0 0 0.1 1 0\n"
        "2 -0.5 0.1 0.2 0 255 0 0.1 1 0\n")


def test_text_model(tmp_path):
    write_text_model(tmp_path)
    scene = load_colmap(tmp_path)
    assert scene.c2ws.shape == (2, 3, 4)
    assert scene.intr.fx == 500.0 and scene.intr.w == 640
    assert scene.image_names == ["a.png", "b.png"]
    np.testing.assert_allclose(scene.points[0], [0.5, 0.5, 0.5])
    np.testing.assert_allclose(scene.colors[0], [1.0, 0.0, 0.0])
    # identity rotation image: c2w translation = -t
    np.testing.assert_allclose(scene.c2ws[0][:, 3], [0, 0, -2.0], atol=1e-6)
    # rotations stay orthonormal
    R = scene.c2ws[1][:, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_binary_model(tmp_path):
    # cameras.bin: one PINHOLE camera
    with open(tmp_path / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<4d", 500.0, 500.0, 320.0, 240.0))
    with open(tmp_path / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 1))
        f.write(struct.pack("<4d", 1, 0, 0, 0))
        f.write(struct.pack("<3d", 0.0, 0.0, 2.0))
        f.write(struct.pack("<i", 1))
        f.write(b"img.png\x00")
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<ddq", 1.0, 2.0, 5))
    with open(tmp_path / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<Q", 7))
        f.write(struct.pack("<3d", 1.0, 2.0, 3.0))
        f.write(struct.pack("<3B", 0, 0, 255))
        f.write(struct.pack("<d", 0.5))
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<ii", 1, 0))
    scene = load_colmap(tmp_path)
    assert scene.c2ws.shape == (1, 3, 4)
    np.testing.assert_allclose(scene.points[0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(scene.colors[0], [0, 0, 1.0])
    np.testing.assert_allclose(scene.c2ws[0][:, 3], [0, 0, -2.0], atol=1e-6)


def test_downsample(tmp_path):
    write_text_model(tmp_path)
    scene = load_colmap(tmp_path, downsample=2)
    assert scene.intr.w == 320 and scene.intr.fx == 250.0
