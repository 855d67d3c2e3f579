"""KITTI velodyne -> depth-map projection (SURVEY.md §2.1 eval loader:
'raw-resolution GT depth from velodyne projection').

Standard KITTI geometry: velodyne points X_v are mapped into camera-2
pixels by  P = P_rect_2 @ R_rect_0 @ Tr_velo_to_cam,  keeping the
nearest depth when multiple points land in one pixel (occlusion).
Pure numpy — this runs once per eval image on the host.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np


def load_velodyne_points(path: str) -> np.ndarray:
    """(N, 4) float32 x,y,z,reflectance."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


def read_calib_file(path: str) -> Dict[str, np.ndarray]:
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, value = line.split(":", 1)
            try:
                out[key.strip()] = np.asarray(
                    [float(x) for x in value.split()], dtype=np.float64
                )
            except ValueError:
                pass  # non-numeric entries (dates etc.)
    return out


def projection_matrix(calib_dir: str, cam: int = 2) -> np.ndarray:
    """(3, 4) full projection velodyne -> image plane of camera `cam`."""
    c2c = read_calib_file(os.path.join(calib_dir, "calib_cam_to_cam.txt"))
    v2c = read_calib_file(os.path.join(calib_dir, "calib_velo_to_cam.txt"))
    tr = np.eye(4)
    tr[:3, :3] = v2c["R"].reshape(3, 3)
    tr[:3, 3] = v2c["T"]
    r_rect = np.eye(4)
    r_rect[:3, :3] = c2c["R_rect_00"].reshape(3, 3)
    p_rect = c2c[f"P_rect_0{cam}"].reshape(3, 4)
    return p_rect @ r_rect @ tr


def depth_from_velodyne(
    points: np.ndarray, proj: np.ndarray, shape: Tuple[int, int]
) -> np.ndarray:
    """Project (N,4) velodyne points into an (H, W) depth map (meters,
    0 = no return); keeps the nearest point per pixel."""
    h, w = shape
    pts = points[points[:, 0] > 1.0]  # points in front of the sensor
    hom = np.hstack([pts[:, :3], np.ones((len(pts), 1))])
    cam = hom @ proj.T  # (N, 3)
    z = cam[:, 2]
    valid = z > 1e-3
    cam, z = cam[valid], z[valid]
    # KITTI convention: round to pixel, then 1-based -> 0-based shift.
    u = np.round(cam[:, 0] / z) - 1
    v = np.round(cam[:, 1] / z) - 1
    inside = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    u, v, z = u[inside].astype(np.int64), v[inside].astype(np.int64), z[inside]
    depth = np.zeros((h, w), dtype=np.float32)
    # nearest-wins: process farthest first so nearer points overwrite
    order = np.argsort(-z)
    depth[v[order], u[order]] = z[order]
    return depth


def depth_from_velodyne_files(
    velo_path: str, calib_dir: str, shape: Tuple[int, int], cam: int = 2
) -> np.ndarray:
    proj = projection_matrix(calib_dir, cam)
    return depth_from_velodyne(load_velodyne_points(velo_path), proj, shape)
