"""ctypes bindings for the C++ host-runtime kernels (runtime/pointprep.cc).

Replaces the reference's numba-JIT geometry kernels and numpy hot loops in the
dataloader workers (SURVEY.md §2.2 'numba JIT' row). Falls back to numpy
implementations when the shared library hasn't been built
(`make -C runtime`), so the framework stays pure-Python-runnable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "runtime", "libpointprep.so",
)


def _stale() -> bool:
    """True when the .so is missing or older than any source/Makefile —
    the binary is never committed (advisor r2: a checked-in blob can't be
    verified against the committed source); it is always built locally."""
    if not os.path.exists(_LIB_PATH):
        return True
    so_mtime = os.path.getmtime(_LIB_PATH)
    src_dir = os.path.dirname(_LIB_PATH)
    for f in os.listdir(src_dir):
        if f.endswith(".cc") or f == "Makefile":
            if os.path.getmtime(os.path.join(src_dir, f)) > so_mtime:
                return True
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if _stale():
        try:  # best-effort build; numpy fallbacks cover failure
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH), "-B"],
                check=True, capture_output=True, timeout=300,
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.transform_points_4x4.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_double,
    ]
    lib.range_filter_pad.restype = ctypes.c_int64
    lib.range_filter_pad.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    lib.points_in_rbbox.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.voxelize_first_occurrence.restype = ctypes.c_int64
    lib.voxelize_first_occurrence.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.normalize_image_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    if hasattr(lib, "plan_frame_topology_native"):  # older .so builds lack it
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.plan_frame_topology_native.restype = ctypes.c_int32
        lib.plan_frame_topology_native.argtypes = (
            [i32p, ctypes.c_int64] + [ctypes.c_int32] * 5 + [i32p] * 16
        )
    if hasattr(lib, "plan_frame_topology_native_v2"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.plan_frame_topology_native_v2.restype = ctypes.c_int32
        lib.plan_frame_topology_native_v2.argtypes = (
            [i32p, ctypes.c_int64] + [ctypes.c_int32] * 6 + [i32p] * 18
        )
    if hasattr(lib, "voxelize_mean_sorted_native"):
        fp = ctypes.POINTER(ctypes.c_float)
        lib.voxelize_mean_sorted_native.restype = ctypes.c_int64
        lib.voxelize_mean_sorted_native.argtypes = (
            [fp, ctypes.c_int64, ctypes.c_int64, fp, fp]
            + [ctypes.c_int64] * 5
            + [fp, ctypes.POINTER(ctypes.c_int32)]
        )
    _LIB = lib
    return lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def available() -> bool:
    return _load() is not None


def transform_points(points: np.ndarray, m: np.ndarray, dt: float) -> np.ndarray:
    """In-place 4×4 transform of [N, 5] points + timestamp write."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    if lib is None:
        hom = np.ones((points.shape[0], 4))
        hom[:, :3] = points[:, :3]
        points[:, :3] = (m @ hom.T).T[:, :3].astype(np.float32)
        points[:, 4] = dt
        return points
    m = np.ascontiguousarray(m, np.float64)
    lib.transform_points_4x4(
        _fptr(points), points.shape[0],
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), float(dt),
    )
    return points


def range_filter_pad(
    points: np.ndarray, pc_range, cap: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """xy range filter + pad to [cap, 5]; returns (padded, mask, n_kept)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    if lib is None:
        m = (
            (points[:, 0] >= pc_range[0]) & (points[:, 0] <= pc_range[3])
            & (points[:, 1] >= pc_range[1]) & (points[:, 1] <= pc_range[4])
        )
        kept = points[m][:cap]
        out = np.zeros((cap, points.shape[1]), np.float32)
        out[: len(kept)] = kept
        mask = np.zeros(cap, bool)
        mask[: len(kept)] = True
        return out, mask, len(kept)
    out = np.empty((cap, 5), np.float32)
    mask = np.empty(cap, np.uint8)
    rng = np.ascontiguousarray(pc_range, np.float64)
    n = lib.range_filter_pad(
        _fptr(points), points.shape[0],
        rng.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _fptr(out), mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    return out, mask.astype(bool), int(n)


def points_in_rbbox(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """[M, N] bool (numba points_in_rbbox replacement)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    boxes = np.ascontiguousarray(boxes[:, :7], np.float32)
    if lib is None:
        px = points[None, :, 0] - boxes[:, None, 0]
        py = points[None, :, 1] - boxes[:, None, 1]
        c = np.cos(-boxes[:, None, 6])
        s = np.sin(-boxes[:, None, 6])
        lx = px * c - py * s
        ly = px * s + py * c
        return (np.abs(lx) <= boxes[:, None, 3] / 2) & (
            np.abs(ly) <= boxes[:, None, 4] / 2
        )
    out = np.empty((boxes.shape[0], points.shape[0]), np.uint8)
    lib.points_in_rbbox(
        _fptr(points), points.shape[0], points.shape[1],
        _fptr(boxes), boxes.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


class HostVoxelizer:
    """Reference-exact first-occurrence voxelizer (spconv PointToVoxel
    semantics) for golden tests and CPU pipelines."""

    def __init__(self, pc_range, voxel_size, grid, max_voxels, max_pts):
        self.pc_range = np.ascontiguousarray(pc_range, np.float64)
        self.voxel_size = np.ascontiguousarray(voxel_size, np.float64)
        self.grid = np.ascontiguousarray(grid, np.int64)
        self.max_voxels = max_voxels
        self.max_pts = max_pts
        self._hash = np.full(int(np.prod(grid)), -1, np.int32)

    def __call__(self, points: np.ndarray):
        lib = _load()
        points = np.ascontiguousarray(points, np.float32)
        nfeat = points.shape[1]
        voxels = np.empty((self.max_voxels, self.max_pts, nfeat), np.float32)
        coords = np.empty((self.max_voxels, 3), np.int32)
        npts = np.empty(self.max_voxels, np.int32)
        if lib is None:
            return self._numpy_fallback(points, voxels, coords, npts)
        nv = lib.voxelize_first_occurrence(
            _fptr(points), points.shape[0], nfeat,
            self.pc_range.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self.voxel_size.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self.grid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.max_voxels, self.max_pts,
            _fptr(voxels),
            coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            npts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._hash.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        nv = int(nv)
        return voxels[:nv], coords[:nv], npts[:nv]

    def _numpy_fallback(self, points, voxels, coords, npts):
        nv = 0
        lut = {}
        voxels[:] = 0
        npts[:] = 0
        nx, ny, nz = self.grid
        vc = np.floor((points[:, :3] - self.pc_range[:3]) / self.voxel_size).astype(int)
        ok = ((vc >= 0) & (vc < self.grid[None, :])).all(1)
        for i in np.nonzero(ok)[0]:
            key = (vc[i, 2], vc[i, 1], vc[i, 0])
            v = lut.get(key)
            if v is None:
                if nv >= self.max_voxels:
                    continue
                v = nv
                lut[key] = v
                coords[v] = key
                nv += 1
            if npts[v] < self.max_pts:
                voxels[v, npts[v]] = points[i]
                npts[v] += 1
        return voxels[:nv], coords[:nv], npts[:nv]


def voxelize_mean_sorted_native(
    points: np.ndarray, pc_range, voxel_size, grid_size,
    max_voxels: int, max_points_per_voxel: int,
):
    """C++ voxelize + mean VFE (runtime/topology.cc); same contract as
    voxelize_host.voxelize_mean_sorted. None when unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "voxelize_mean_sorted_native"):
        return None
    points = np.ascontiguousarray(points, np.float32)
    C = points.shape[1]
    nx, ny, nz = (int(g) for g in grid_size)
    feats = np.empty((max_voxels, C), np.float32)
    coords = np.empty((max_voxels, 3), np.int32)
    pcr = np.ascontiguousarray(pc_range, np.float32)
    vsz = np.ascontiguousarray(voxel_size, np.float32)
    lib.voxelize_mean_sorted_native(
        _fptr(points), points.shape[0], C, _fptr(pcr), _fptr(vsz),
        nx, ny, nz, max_voxels, max_points_per_voxel,
        _fptr(feats), coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return feats, coords


def plan_frame_topology_native(coords: np.ndarray, grid_size, stage_caps,
                               s0_cap=None):
    """C++ chunked-encoder topology planner (runtime/topology.cc) — exact to
    the integer vs the numpy planner (topology_host.plan_frame_topology);
    ~20x faster per frame. Returns None when the library is unavailable or
    lacks the needed symbol (caller falls back to numpy)."""
    lib = _load()
    if lib is None or not hasattr(lib, "plan_frame_topology_native_v2"):
        return None
    coords = np.ascontiguousarray(coords, np.int32)
    V = coords.shape[0]
    S0 = V if s0_cap is None else min(V, int(s0_cap))
    S2, S3 = int(stage_caps[0]), int(stage_caps[1])
    nx, ny, nz = (int(g) for g in grid_size)
    out = {
        "ck0": np.empty(S0, np.int32), "ch0": np.empty(S0, np.int32),
        "src0": np.empty((S0, 4), np.int32), "nbr0": np.empty((9, S0), np.int32),
        "ck2": np.empty(S2, np.int32), "ch2": np.empty(S2, np.int32),
        "a2": np.empty((9, S2), np.int32), "b2": np.empty((9, S2), np.int32),
        "nbr2": np.empty((9, S2), np.int32), "rev2": np.empty((9, S0), np.int32),
        "ck3": np.empty(S3, np.int32), "ch3": np.empty(S3, np.int32),
        "a3": np.empty((9, S3), np.int32), "b3": np.empty((9, S3), np.int32),
        "nbr3": np.empty((9, S3), np.int32), "rev3": np.empty((9, S2), np.int32),
        "occ2": np.empty(S2, np.int32), "occ3": np.empty(S3, np.int32),
    }

    def p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    rc = lib.plan_frame_topology_native_v2(
        p(coords), V, S0, nx, ny, nz, S2, S3,
        p(out["ck0"]), p(out["ch0"]), p(out["src0"]), p(out["nbr0"]),
        p(out["ck2"]), p(out["ch2"]), p(out["a2"]), p(out["b2"]),
        p(out["nbr2"]), p(out["rev2"]),
        p(out["ck3"]), p(out["ch3"]), p(out["a3"]), p(out["b3"]),
        p(out["nbr3"]), p(out["rev3"]), p(out["occ2"]), p(out["occ3"]),
    )
    if rc < 0:
        return None
    out["s0_dropped"] = np.int32(rc)
    return out


def normalize_image(img: np.ndarray, mean, std, swap_channels=True) -> np.ndarray:
    lib = _load()
    if lib is None or img.dtype != np.uint8:
        from unidistill_tpu.data.transforms import normalize_image as np_norm

        return np_norm(img, mean, std, swap_channels)
    img = np.ascontiguousarray(img)
    out = np.empty(img.shape, np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    stdinv = np.ascontiguousarray(1.0 / np.asarray(std, np.float32), np.float32)
    lib.normalize_image_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0] * img.shape[1], _fptr(mean), _fptr(stdinv),
        1 if swap_channels else 0, _fptr(out),
    )
    return out
