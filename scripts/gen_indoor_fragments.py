#!/usr/bin/env python
"""Generate synthetic indoor-like .ply fragments in the 7-Scenes layout.

The environment has zero egress, so the real 7-Scenes fragments
(reference datasets/realdata.py:64-135) cannot be downloaded. This builds
geometrically comparable stand-ins: room-scale scenes (floor + walls +
box/cylinder "furniture"), ~55k points each at ~3 cm spacing with 3 mm
sensor noise — the same scale the indoor preset's constants assume
(overlap_radius 0.0375 m, ICP voxel 0.035 m, crop 70%, rot<=45 deg,
trans<=0.5 m). Each fragment is an independent random room; Scene7 pairs
a fragment with a cropped/transformed copy of itself, so fragment count
is the dataset size.

Layout written (Scene7.__init__, ogmm_tpu/data/realdata.py:45-54):
    <root>/7scene/7-scenes-{chess,fire,heads,pumpkin,redkitchen,stairs}/*.ply   (train)
    <root>/7scene/7-scenes-office/*.ply                                         (test)

Usage: python scripts/gen_indoor_fragments.py <root> [n_train_per_scene] [n_test]
"""
import os
import struct
import sys

import numpy as np

N_POINTS = 55000   # > indoor preset n_points=50000, like the real fragments


def _quad(rs, origin, u, v, n):
    """n points uniform on the parallelogram origin + a*u + b*v."""
    a = rs.rand(n, 1)
    b = rs.rand(n, 1)
    return origin + a * u + b * v


def _cylinder(rs, center, radius, height, n):
    th = rs.rand(n) * 2 * np.pi
    z = rs.rand(n) * height
    return np.stack([center[0] + radius * np.cos(th),
                     center[1] + radius * np.sin(th),
                     center[2] + z], axis=1)


def make_room(seed: int, n_points: int = N_POINTS) -> np.ndarray:
    """One random room: floor, 2-3 walls, 3-7 boxes, 0-2 cylinders."""
    rs = np.random.RandomState(seed)
    lx, ly = rs.uniform(2.5, 4.5, 2)
    h = rs.uniform(2.0, 2.6)
    faces = []   # (origin, u, v, area)

    def add(origin, u, v):
        area = np.linalg.norm(np.cross(u, v))
        faces.append((np.asarray(origin, np.float64),
                      np.asarray(u, np.float64),
                      np.asarray(v, np.float64), area))

    add([0, 0, 0], [lx, 0, 0], [0, ly, 0])                     # floor
    walls = [([0, 0, 0], [lx, 0, 0], [0, 0, h]),
             ([0, 0, 0], [0, ly, 0], [0, 0, h]),
             ([0, ly, 0], [lx, 0, 0], [0, 0, h]),
             ([lx, 0, 0], [0, ly, 0], [0, 0, h])]
    for w in [walls[i] for i in rs.permutation(4)[:rs.randint(2, 4)]]:
        add(*w)

    for _ in range(rs.randint(3, 8)):                           # boxes
        sx, sy = rs.uniform(0.3, 1.2, 2)
        sz = rs.uniform(0.3, 1.0)
        ox, oy = rs.uniform(0.2, lx - 1.4), rs.uniform(0.2, ly - 1.4)
        o = [ox, oy, 0.0]
        add([o[0], o[1], sz], [sx, 0, 0], [0, sy, 0])           # top
        add(o, [sx, 0, 0], [0, 0, sz])                          # 4 sides
        add(o, [0, sy, 0], [0, 0, sz])
        add([o[0], o[1] + sy, 0], [sx, 0, 0], [0, 0, sz])
        add([o[0] + sx, o[1], 0], [0, sy, 0], [0, 0, sz])

    areas = np.array([f[3] for f in faces])
    cyl_pts = []
    for _ in range(rs.randint(0, 3)):                           # cylinders
        c = [rs.uniform(0.3, lx - 0.3), rs.uniform(0.3, ly - 0.3), 0.0]
        cyl_pts.append((rs.uniform(0.1, 0.35), rs.uniform(0.4, 1.2), c))
    cyl_area = sum(2 * np.pi * r * hh for r, hh, _ in cyl_pts)

    total = areas.sum() + cyl_area
    counts = np.maximum(1, (areas / total * n_points)).astype(int)
    parts = [_quad(rs, o, u, v, c) for (o, u, v, _), c in zip(faces, counts)]
    for r, hh, c in cyl_pts:
        parts.append(_cylinder(rs, c, r, hh,
                               max(1, int(2 * np.pi * r * hh / total
                                          * n_points))))
    pts = np.concatenate(parts, axis=0)
    # top up / trim to exactly n_points, then recentre and add sensor noise
    if len(pts) < n_points:
        extra = _quad(rs, *faces[0][:3], n_points - len(pts))
        pts = np.concatenate([pts, extra], axis=0)
    pts = pts[rs.permutation(len(pts))[:n_points]]
    pts = pts - pts.mean(axis=0)
    pts = pts + rs.randn(n_points, 3) * 0.003
    return pts.astype(np.float32)


def write_ply(path: str, verts: np.ndarray) -> None:
    """Minimal binary-little-endian PLY (what data/mesh.py:plyread parses)."""
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {len(verts)}\n"
              "property float x\nproperty float y\nproperty float z\n"
              "end_header\n")
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(np.ascontiguousarray(verts, dtype="<f4").tobytes())


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/indoor_data"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_test = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    scenes = {f"7-scenes-{s}": n_train
              for s in ("chess", "fire", "heads", "pumpkin", "redkitchen",
                        "stairs")}
    scenes["7-scenes-office"] = n_test
    seed = 0
    for scene, count in sorted(scenes.items()):
        d = os.path.join(root, "7scene", scene)
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            write_ply(os.path.join(d, f"frag_{i:03d}.ply"),
                      make_room(seed))
            seed += 1
    total = sum(scenes.values())
    print(f"wrote {total} fragments ({N_POINTS} pts each) under "
          f"{root}/7scene")


if __name__ == "__main__":
    main()
