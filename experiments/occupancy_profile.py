"""Measured slot occupancy of realistic nuScenes-like clouds vs the static
caps (PROFILE.md lever: eval caps are reference-parity slack; what do real
clouds actually need?).

Cloud model (per nuScenes lidar statistics): 10-sweep aggregate ~250k
points; ground-plane returns dominate (~60%), the rest on vertical
structures (cars, walls, poles) clustered near the ego vehicle with a
1/r^2-ish radial density."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from unidistill_tpu.configs.nuscenes import lidar_exp
from unidistill_tpu.data.topology_host import plan_frame_topology
from unidistill_tpu.data.voxelize_host import voxelize_frame


def realistic_cloud(rng, n=250_000):
    pts = np.zeros((n, 5), np.float32)
    n_ground = int(n * 0.6)
    # radial density ~ 1/r (beam geometry): sample r via exp of uniform
    r = 2.0 + 52.0 * rng.power(0.45, n_ground)
    th = rng.uniform(0, 2 * np.pi, n_ground)
    pts[:n_ground, 0] = r * np.cos(th)
    pts[:n_ground, 1] = r * np.sin(th)
    pts[:n_ground, 2] = rng.normal(-1.8, 0.05, n_ground) + 0.01 * r
    k = n_ground
    # ~40 objects: boxes of returns
    n_obj = 40
    per = (n - n_ground) // (n_obj + 2)
    for _ in range(n_obj):
        cx, cy = rng.uniform(-40, 40, 2)
        w, l, h = rng.uniform(1.5, 3, 1)[0], rng.uniform(3, 8, 1)[0], rng.uniform(1.2, 3, 1)[0]
        pts[k:k+per, 0] = cx + rng.uniform(-l/2, l/2, per)
        pts[k:k+per, 1] = cy + rng.uniform(-w/2, w/2, per)
        pts[k:k+per, 2] = rng.uniform(-1.8, -1.8+h, per)
        k += per
    # walls / buildings at the range boundary
    rest = n - k
    side = rng.uniform(30, 53, rest)
    ang = rng.uniform(0, 2*np.pi, rest)
    pts[k:, 0] = side * np.cos(ang)
    pts[k:, 1] = side * np.sin(ang)
    pts[k:, 2] = rng.uniform(-1.8, 4.0, rest)
    pts[:, 3] = rng.uniform(0, 255, n)
    return pts


def main():
    cfg = lidar_exp().model
    caps = cfg.lidar_encoder.stage_voxel_caps
    rng = np.random.RandomState(0)
    stats = []
    for i in range(5):
        pts = realistic_cloud(rng)
        mask = np.ones(len(pts), bool)
        vf, vc = voxelize_frame(pts, mask, cfg, training=False)
        V = int((vc[:, 0] >= 0).sum())
        topo = plan_frame_topology(vc, cfg.grid_size, caps)
        row = {"V": V}
        for key, name in (("ck0", "S0"), ("ck2", "S2"), ("ck3", "S3")):
            hw = {"S0": 1440*1440, "S2": 720*720, "S3": 360*360}[name]
            row[name] = int((topo[key] < hw).sum())
        stats.append(row)
        print(row, flush=True)
    print("caps:", {"V": 120000, "S2": caps[0], "S3": caps[1]})


if __name__ == "__main__":
    main()
