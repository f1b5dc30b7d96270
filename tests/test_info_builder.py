"""info_builder: synthetic RAW nuScenes tables → info pkls → dataset frames.

Round-trips the real-data path (VERDICT r2 §8): builds a miniature raw
nuScenes directory (JSON tables + point bins + jpegs), runs the builder, and
checks (a) the geometry of the emitted lidar-frame GT against a hand
transform, (b) sweep collection semantics, and (c) that `NuScenesDataset`
consumes the result end-to-end."""
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from unidistill_tpu.data.info_builder import (
    Tables, build_split_infos, main as builder_main,
)
from unidistill_tpu.data.transforms import quaternion_rotation_matrix


def _quat_z(yaw):
    return [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]


EGO_T = [100.0, 50.0, 0.0]
EGO_YAW = 0.7
LIDAR_T = [0.9, 0.0, 1.8]          # lidar mounted forward/up on the ego
ANN_GLOBAL = [120.0, 60.0, 1.0]    # a car somewhere ahead
ANN_YAW = 1.1
ANN_SIZE = [2.0, 4.5, 1.6]         # nuScenes (w, l, h)


def build_raw_nusc(root):
    """Write a 1-scene, 2-sample raw nuScenes v1.0-mini tree. Scene name
    'scene-0061' so the built-in mini_train split picks it up."""
    version_dir = root / "v1.0-mini"
    os.makedirs(version_dir, exist_ok=True)
    os.makedirs(root / "samples", exist_ok=True)
    os.makedirs(root / "sweeps", exist_ok=True)

    rng = np.random.RandomState(0)
    tables = {n: [] for n in Tables.NAMES}

    tables["scene"].append(dict(
        token="sc0", name="scene-0061", first_sample_token="sa0",
    ))
    tables["sensor"] += [
        dict(token="se_lidar", channel="LIDAR_TOP", modality="lidar"),
        dict(token="se_camf", channel="CAM_FRONT", modality="camera"),
    ]
    intr = [[1200.0, 0, 800], [0, 1200.0, 450], [0, 0, 1]]
    tables["calibrated_sensor"] += [
        dict(token="cs_lidar", sensor_token="se_lidar",
             translation=LIDAR_T, rotation=_quat_z(0.0), camera_intrinsic=[]),
        dict(token="cs_camf", sensor_token="se_camf",
             translation=[1.5, 0.0, 1.5], rotation=_quat_z(-0.5),
             camera_intrinsic=intr),
    ]
    tables["category"].append(dict(token="cat_car", name="vehicle.car"))
    tables["instance"].append(dict(token="in0", category_token="cat_car"))

    for i in range(2):
        ts = 1_000_000 * (i + 1)
        tables["sample"].append(dict(
            token=f"sa{i}", timestamp=ts, scene_token="sc0",
            prev=f"sa{i-1}" if i else "", next=f"sa{i+1}" if i == 0 else "",
        ))
        tables["ego_pose"].append(dict(
            token=f"ep{i}", timestamp=ts,
            translation=[EGO_T[0] + 5.0 * i, EGO_T[1], EGO_T[2]],
            rotation=_quat_z(EGO_YAW),
        ))
        # key lidar frame
        lf = f"samples/lidar_{i}.bin"
        pts = rng.uniform(-30, 30, (2000, 5)).astype(np.float32)
        pts[:, 2] = rng.uniform(-2, 1, 2000)
        pts.tofile(str(root / lf))
        tables["sample_data"].append(dict(
            token=f"sd_l{i}", sample_token=f"sa{i}", ego_pose_token=f"ep{i}",
            calibrated_sensor_token="cs_lidar", filename=lf,
            is_key_frame=True, timestamp=ts,
            prev="sd_lsw0" if i == 1 else "", next="",
        ))
        # camera key frame
        cf = f"samples/camf_{i}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (900, 1600, 3), np.uint8)).save(str(root / cf))
        tables["sample_data"].append(dict(
            token=f"sd_c{i}", sample_token=f"sa{i}", ego_pose_token=f"ep{i}",
            calibrated_sensor_token="cs_camf", filename=cf,
            is_key_frame=True, timestamp=ts, prev="", next="",
        ))
        # annotation: the same instance in both samples, moving +2 m/s in x
        tables["sample_annotation"].append(dict(
            token=f"an{i}", sample_token=f"sa{i}", instance_token="in0",
            translation=[ANN_GLOBAL[0] + 2.0 * i, ANN_GLOBAL[1], ANN_GLOBAL[2]],
            size=ANN_SIZE, rotation=_quat_z(ANN_YAW),
            prev=f"an{i-1}" if i else "", next=f"an{i+1}" if i == 0 else "",
            num_lidar_pts=25, num_radar_pts=3,
        ))

    # ONE intermediate sweep before sample 1 (sample 0 has none → the
    # only-available-sweeps semantics is exercised)
    sw = "sweeps/lidar_sw0.bin"
    rng.uniform(-30, 30, (500, 5)).astype(np.float32).tofile(str(root / sw))
    tables["ego_pose"].append(dict(
        token="ep_sw0", timestamp=1_500_000,
        translation=[EGO_T[0] + 2.5, EGO_T[1], EGO_T[2]],
        rotation=_quat_z(EGO_YAW),
    ))
    tables["sample_data"].append(dict(
        token="sd_lsw0", sample_token="sa1", ego_pose_token="ep_sw0",
        calibrated_sensor_token="cs_lidar", filename=sw,
        is_key_frame=False, timestamp=1_500_000, prev="", next="sd_l1",
    ))

    for name, rows in tables.items():
        with open(version_dir / f"{name}.json", "w") as f:
            json.dump(rows, f)
    return str(root)


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    return build_raw_nusc(tmp_path_factory.mktemp("rawnusc"))


def test_builder_geometry(raw_root):
    tb = Tables(raw_root, "v1.0-mini")
    infos = build_split_infos(tb, ["scene-0061"], max_sweeps=10)
    assert len(infos) == 2
    info = infos[0]

    # hand transform: global annotation → lidar frame
    ego2g = np.eye(4)
    ego2g[:3, :3] = quaternion_rotation_matrix(_quat_z(EGO_YAW))
    ego2g[:3, 3] = EGO_T
    l2e = np.eye(4)
    l2e[:3, 3] = LIDAR_T
    g2l = np.linalg.inv(l2e) @ np.linalg.inv(ego2g)
    want_center = (g2l @ np.append(ANN_GLOBAL, 1.0))[:3]
    box = info["gt_boxes"][0]
    np.testing.assert_allclose(box[:3], want_center, atol=1e-9)
    # dims reordered to (dx=l, dy=w, dz=h)
    np.testing.assert_allclose(box[3:6], [ANN_SIZE[1], ANN_SIZE[0], ANN_SIZE[2]])
    # yaw composes with the ego rotation
    np.testing.assert_allclose(box[6], ANN_YAW - EGO_YAW, atol=1e-9)
    # velocity: instance moves +2 m/s along global x over the 1 s gap,
    # rotated into the lidar frame
    want_v = g2l[:3, :3] @ [2.0, 0.0, 0.0]
    np.testing.assert_allclose(box[7:9], want_v[:2], atol=1e-9)
    assert list(info["gt_names"]) == ["vehicle.car"]
    assert info["num_lidar_pts"][0] == 25

    # frames: inverses stored as documented
    np.testing.assert_allclose(
        info["car_from_global"], np.linalg.inv(ego2g), atol=1e-12)
    np.testing.assert_allclose(
        info["ref_from_car"], np.linalg.inv(l2e), atol=1e-12)

    # sweeps: sample 0 has none, sample 1 exactly one (only what exists)
    assert info["lidar_sweeps"] == []
    assert len(infos[1]["lidar_sweeps"]) == 1
    assert infos[1]["lidar_sweeps"][0]["LIDAR_TOP"]["timestamp"] == 1_500_000


def test_builder_cli_and_dataset_roundtrip(raw_root, tmp_path):
    out = str(tmp_path / "infos")
    builder_main(["--dataroot", raw_root, "--version", "v1.0-mini",
                  "--out", out])
    with open(os.path.join(out, "train_info.pkl"), "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 2  # scene-0061 is in the built-in mini_train list
    with open(os.path.join(out, "val_info.pkl"), "rb") as f:
        assert pickle.load(f) == []  # no mini_val scene in the synth tree

    # the dataset consumes the built pkls directly (info files in `out`,
    # media relative to the raw root)
    import dataclasses

    from unidistill_tpu.configs.nuscenes import DataConfig, tiny_model
    from unidistill_tpu.data.dataset import NuScenesDataset

    # point root at the raw tree and copy the pkl beside it, as documented
    import shutil

    shutil.copy(os.path.join(out, "train_info.pkl"),
                os.path.join(raw_root, "train_info.pkl"))
    mcfg = dataclasses.replace(tiny_model(), with_camera=False)
    dcfg = DataConfig(root_path=raw_root, num_lidar_sweeps=10, use_cbgs=False)
    ds = NuScenesDataset(dcfg, mcfg, "training", seed=0)
    f = ds[0]
    assert f["points"].shape == (mcfg.caps.max_points, 5)
    valid = np.abs(f["gt_boxes"]).sum(-1) > 0
    assert valid.sum() == 1  # the planted car, mapped to class id 1
    assert f["gt_boxes"][valid][0, 9] == 1.0
