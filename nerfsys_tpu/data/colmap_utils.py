"""COLMAP sparse-model readers (binary and text), host-side numpy.

Fresh implementation of the documented COLMAP on-disk format
(cameras/images/points3D in .bin or .txt), providing the same surface as the
reference's reader (/root/reference/adaptive_nerf/data/colmap_utils.py:73-404):
`read_model`, `qvec2rotmat`, `get_cam_intrinsics` with distortion-model
classification.
"""
from __future__ import annotations

import dataclasses
import os
import struct
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class Camera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclasses.dataclass
class Image:
    id: int
    qvec: np.ndarray  # (4,) w, x, y, z
    tvec: np.ndarray  # (3,)
    camera_id: int
    name: str
    xys: np.ndarray  # (P, 2)
    point3D_ids: np.ndarray  # (P,)


@dataclasses.dataclass
class Point3D:
    id: int
    xyz: np.ndarray
    rgb: np.ndarray
    error: float
    image_ids: np.ndarray
    point2D_idxs: np.ndarray


# COLMAP camera model ids -> (name, #params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
CAMERA_MODEL_IDS = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}
CAMERA_MODEL_NPARAMS = {name: n for _, (name, n) in CAMERA_MODELS.items()}


def qvec2rotmat(qvec) -> np.ndarray:
    """COLMAP quaternion (w, x, y, z) -> 3x3 rotation matrix."""
    w, x, y, z = [float(v) for v in qvec]
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def rotmat2qvec(R: np.ndarray) -> np.ndarray:
    """3x3 rotation matrix -> COLMAP quaternion (w, x, y, z)."""
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = (
        np.array(
            [
                [Rxx - Ryy - Rzz, 0, 0, 0],
                [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
                [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
                [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
            ]
        )
        / 3.0
    )
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    if q[0] < 0:
        q = -q
    return q


# --------------------------- binary readers ---------------------------------
def _read(fid, fmt: str):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, fid.read(size))


def read_cameras_binary(path) -> Dict[int, Camera]:
    cams: Dict[int, Camera] = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            cid, mid, w, h = _read(f, "<iiQQ")
            name, nparams = CAMERA_MODELS[mid]
            params = np.array(_read(f, f"<{nparams}d"))
            cams[cid] = Camera(cid, name, int(w), int(h), params)
    return cams


def read_images_binary(path) -> Dict[int, Image]:
    images: Dict[int, Image] = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            iid = _read(f, "<i")[0]
            qvec = np.array(_read(f, "<4d"))
            tvec = np.array(_read(f, "<3d"))
            cam_id = _read(f, "<i")[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (npts,) = _read(f, "<Q")
            data = np.frombuffer(
                f.read(24 * npts), dtype=[("xy", "<f8", 2), ("id", "<i8")]
            )
            images[iid] = Image(
                iid, qvec, tvec, cam_id, name.decode("utf-8"),
                data["xy"].copy(), data["id"].copy(),
            )
    return images


def read_points3D_binary(path) -> Dict[int, Point3D]:
    pts: Dict[int, Point3D] = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            pid = _read(f, "<Q")[0]
            xyz = np.array(_read(f, "<3d"))
            rgb = np.array(_read(f, "<3B"))
            (err,) = _read(f, "<d")
            (tlen,) = _read(f, "<Q")
            track = np.frombuffer(
                f.read(8 * tlen), dtype=[("img", "<i4"), ("p2d", "<i4")]
            )
            pts[pid] = Point3D(
                pid, xyz, rgb, float(err), track["img"].copy(), track["p2d"].copy()
            )
    return pts


# --------------------------- text readers -----------------------------------
def _data_lines(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                yield line


def read_cameras_text(path) -> Dict[int, Camera]:
    cams: Dict[int, Camera] = {}
    for line in _data_lines(path):
        parts = line.split()
        cid = int(parts[0])
        cams[cid] = Camera(
            cid, parts[1], int(parts[2]), int(parts[3]),
            np.array([float(p) for p in parts[4:]]),
        )
    return cams


def read_images_text(path) -> Dict[int, Image]:
    images: Dict[int, Image] = {}
    lines = list(_data_lines(path))
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        iid = int(parts[0])
        qvec = np.array([float(p) for p in parts[1:5]])
        tvec = np.array([float(p) for p in parts[5:8]])
        cam_id = int(parts[8])
        name = parts[9]
        if i + 1 < len(lines):
            obs = lines[i + 1].split()
            xys = np.array(
                [[float(obs[j]), float(obs[j + 1])] for j in range(0, len(obs), 3)]
            ).reshape(-1, 2)
            ids = np.array([int(obs[j + 2]) for j in range(0, len(obs), 3)])
        else:
            xys = np.zeros((0, 2))
            ids = np.zeros((0,), dtype=np.int64)
        images[iid] = Image(iid, qvec, tvec, cam_id, name, xys, ids)
    return images


def read_points3D_text(path) -> Dict[int, Point3D]:
    pts: Dict[int, Point3D] = {}
    for line in _data_lines(path):
        parts = line.split()
        pid = int(parts[0])
        xyz = np.array([float(p) for p in parts[1:4]])
        rgb = np.array([int(p) for p in parts[4:7]])
        err = float(parts[7])
        track = np.array([int(p) for p in parts[8:]]).reshape(-1, 2)
        pts[pid] = Point3D(pid, xyz, rgb, err, track[:, 0], track[:, 1])
    return pts


# --------------------------- model API --------------------------------------
def detect_model_format(path) -> Optional[str]:
    path = Path(path)
    if (path / "cameras.bin").exists():
        return ".bin"
    if (path / "cameras.txt").exists():
        return ".txt"
    return None


def read_model(path, ext: Optional[str] = None):
    """Read a COLMAP sparse model dir -> (cameras, images, points3D) dicts."""
    path = Path(path)
    if ext is None:
        ext = detect_model_format(path)
        if ext is None:
            raise FileNotFoundError(f"No COLMAP model found under {path}")
    if ext == ".bin":
        cameras = read_cameras_binary(path / "cameras.bin")
        images = read_images_binary(path / "images.bin")
        p3d_path = path / "points3D.bin"
        points = read_points3D_binary(p3d_path) if p3d_path.exists() else {}
    else:
        cameras = read_cameras_text(path / "cameras.txt")
        images = read_images_text(path / "images.txt")
        p3d_path = path / "points3D.txt"
        points = read_points3D_text(p3d_path) if p3d_path.exists() else {}
    return cameras, images, points


# --------------------------- writers (for tests/tools) ----------------------
def write_cameras_binary(cams: Dict[int, Camera], path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cam in cams.values():
            mid = CAMERA_MODEL_IDS[cam.model]
            f.write(struct.pack("<iiQQ", cam.id, mid, cam.width, cam.height))
            f.write(struct.pack(f"<{len(cam.params)}d", *cam.params))


def write_images_binary(images: Dict[int, Image], path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im in images.values():
            f.write(struct.pack("<i", im.id))
            f.write(struct.pack("<4d", *im.qvec))
            f.write(struct.pack("<3d", *im.tvec))
            f.write(struct.pack("<i", im.camera_id))
            f.write(im.name.encode("utf-8") + b"\x00")
            f.write(struct.pack("<Q", len(im.point3D_ids)))
            for xy, pid in zip(im.xys, im.point3D_ids):
                f.write(struct.pack("<ddq", xy[0], xy[1], int(pid)))


def write_points3D_binary(points: Dict[int, Point3D], path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for pt in points.values():
            f.write(struct.pack("<Q", pt.id))
            f.write(struct.pack("<3d", *pt.xyz))
            f.write(struct.pack("<3B", *pt.rgb.astype(np.uint8)))
            f.write(struct.pack("<d", pt.error))
            f.write(struct.pack("<Q", len(pt.image_ids)))
            for img, p2d in zip(pt.image_ids, pt.point2D_idxs):
                f.write(struct.pack("<ii", int(img), int(p2d)))


# --------------------------- intrinsics --------------------------------------
def get_cam_intrinsics(camera: Camera) -> Tuple[np.ndarray, np.ndarray, str]:
    """(fx fy cx cy), distortion params, and distortion class.

    Distortion class in {'undistorted', 'opencv', 'fisheye'} mirroring the
    reference's classification for the undistort step.
    """
    m = camera.model
    p = camera.params
    if m == "SIMPLE_PINHOLE":
        intr = np.array([p[0], p[0], p[1], p[2]])
        return intr, np.zeros(4), "undistorted"
    if m == "PINHOLE":
        return np.array([p[0], p[1], p[2], p[3]]), np.zeros(4), "undistorted"
    if m == "SIMPLE_RADIAL":
        intr = np.array([p[0], p[0], p[1], p[2]])
        return intr, np.array([p[3], 0, 0, 0]), "opencv"
    if m == "RADIAL":
        intr = np.array([p[0], p[0], p[1], p[2]])
        return intr, np.array([p[3], p[4], 0, 0]), "opencv"
    if m == "OPENCV":
        return np.array(p[:4]), np.array(p[4:8]), "opencv"
    if m == "OPENCV_FISHEYE":
        return np.array(p[:4]), np.array(p[4:8]), "fisheye"
    raise ValueError(f"Unsupported COLMAP camera model: {m}")
