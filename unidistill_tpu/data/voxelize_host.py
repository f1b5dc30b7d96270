"""Host-side voxelization + mean VFE for the data-loader workers.

Semantics identical to the on-device `ops/voxelize.voxelize` (itself matched
to spconv PointToVoxel + MeanVFE, ref data/det3d/preprocess/voxelization.py:
8-73 and layers/…/vfe/mean_vfe.py:6-34); cross-checked in
tests/test_voxelize_host.py.

Why host-side: the device voxelizer costs ~210 ms of the LiDAR step on v5e
(narrow [P,5]/[V,5] arrays are lane-padded up to 25× by the (8,128) tile;
PROFILE.md). Voxelizing in the loader workers overlaps it with device
compute — the reference does the equivalent by running its CUDA voxelizer
inside the forward pass, but its DataLoader workers similarly overlap the
rest of the CPU pipeline. The device path remains available (steps.py falls
back when a batch carries raw points only) for serving/export and tests.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def voxelize_mean_sorted(
    points: np.ndarray,          # [N, C] float32 (x, y, z, ...)
    point_cloud_range,
    voxel_size,
    grid_size: Tuple[int, int, int],
    max_voxels: int,
    max_points_per_voxel: int,
):
    """→ (feats [V, C] mean per voxel, coords [V, 3] (z,y,x), xy-major
    key-sorted with -1/-0 padding) — bitwise-compatible with
    `ops.voxelize.voxelize` on the same input.

    Dispatches to the C++ kernel (runtime/topology.cc) when built — the
    numpy path below is the executable spec and fallback (equivalence
    tested in tests/test_voxelize_host.py)."""
    from unidistill_tpu.data import native

    nat = native.voxelize_mean_sorted_native(
        points, point_cloud_range, voxel_size, grid_size,
        max_voxels, max_points_per_voxel,
    )
    if nat is not None:
        return nat
    nx, ny, nz = grid_size
    pcr = np.asarray(point_cloud_range, np.float32)
    vsz = np.asarray(voxel_size, np.float32)
    C = points.shape[1]

    vc = np.floor((points[:, :3] - pcr[:3]) / vsz).astype(np.int64)
    ok = (
        (vc[:, 0] >= 0) & (vc[:, 0] < nx)
        & (vc[:, 1] >= 0) & (vc[:, 1] < ny)
        & (vc[:, 2] >= 0) & (vc[:, 2] < nz)
    )
    pts = points[ok]
    vc = vc[ok]
    key = (vc[:, 1] * nx + vc[:, 0]) * nz + vc[:, 2]

    order = np.argsort(key, kind="stable")
    skey = key[order]
    spts = pts[order]
    svc = vc[order]

    uniq, start, counts = np.unique(skey, return_index=True, return_counts=True)
    nv = min(len(uniq), max_voxels)

    feats = np.zeros((max_voxels, C), np.float32)
    coords = np.full((max_voxels, 3), -1, np.int32)
    # per-voxel mean over the FIRST max_points_per_voxel arrivals (stable
    # sort keeps original point order within a voxel) via cumsum differences
    csum = np.concatenate(
        [np.zeros((1, C), np.float64), np.cumsum(spts, axis=0, dtype=np.float64)]
    )
    s = start[:nv]
    n = np.minimum(counts[:nv], max_points_per_voxel)
    feats[:nv] = ((csum[s + n] - csum[s]) / np.maximum(n, 1)[:, None]).astype(
        np.float32
    )
    coords[:nv, 0] = svc[s, 2]
    coords[:nv, 1] = svc[s, 1]
    coords[:nv, 2] = svc[s, 0]
    return feats, coords


# Count of frames whose occupied-voxel count hit the cap (truncation). The
# advisor flagged that a binding cap silently drops voxels; surfacing the
# counter lets runs verify the cap never binds on their data (per-process;
# loader workers each count their own frames).
CAP_BIND_COUNT = 0


def voxelize_frame(points_padded, points_mask, mcfg, training: bool):
    """Dataset-side helper: voxelize one padded frame with the split's cap."""
    global CAP_BIND_COUNT
    caps = mcfg.caps
    max_v = caps.max_voxels_train if training else caps.max_voxels_eval
    feats, coords = voxelize_mean_sorted(
        points_padded[points_mask],
        mcfg.point_cloud_range, mcfg.voxel_size, mcfg.grid_size,
        max_v, caps.max_points_per_voxel,
    )
    if coords[-1, 0] >= 0:  # last slot occupied → the cap bound this frame
        CAP_BIND_COUNT += 1
    return feats, coords
