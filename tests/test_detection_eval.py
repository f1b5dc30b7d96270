"""Native detection_cvpr_2019 evaluator (data/detection_eval.py) against
hand-computed scenarios — substitutes for the devkit's DetectionEval
(absent in this container; ref evaluate.py:87-117).
"""
import json
import math

import numpy as np
import pytest

from unidistill_tpu.configs.nuscenes import CLASS_NAMES
from unidistill_tpu.data.detection_eval import (
    DIST_THS,
    MetricData,
    accumulate,
    calc_ap,
    calc_tp,
    evaluate_detection,
    evaluate_submission_native,
    gt_from_infos,
    quaternion_yaw,
)

ATTR = {
    "car": "vehicle.parked", "truck": "vehicle.parked", "bus": "vehicle.moving",
    "trailer": "vehicle.parked", "construction_vehicle": "vehicle.parked",
    "pedestrian": "pedestrian.moving", "motorcycle": "cycle.without_rider",
    "bicycle": "cycle.without_rider", "barrier": "", "traffic_cone": "",
}


def mkbox(name, xy, score=None, size=(2.0, 4.0, 1.5), yaw=0.0, vel=(0.0, 0.0),
          attr=None, num_pts=10):
    b = dict(
        detection_name=name,
        translation=[float(xy[0]), float(xy[1]), 1.0],
        size=list(size),
        rotation=[math.cos(yaw / 2), 0.0, 0.0, math.sin(yaw / 2)],
        velocity=list(vel),
        attribute_name=ATTR[name] if attr is None else attr,
    )
    if score is None:
        b["num_pts"] = num_pts
    else:
        b["detection_score"] = float(score)
    return b


EGO = {"t0": np.zeros(2), "t1": np.zeros(2)}


def test_perfect_predictions_give_map_1_nds_1():
    gt, pr = {"t0": []}, {"t0": []}
    for i, name in enumerate(CLASS_NAMES):
        xy = (5.0 + 2 * i, 0.0)
        gt["t0"].append(mkbox(name, xy))
        pr["t0"].append(mkbox(name, xy, score=0.9))
    m = evaluate_detection(gt, pr, EGO)
    assert m["mean_ap"] == pytest.approx(1.0)
    assert m["nd_score"] == pytest.approx(1.0)
    for name in CLASS_NAMES:
        assert m["mean_dist_aps"][name] == pytest.approx(1.0)
    # per-class exclusions surface as NaN
    assert math.isnan(m["label_tp_errors"]["traffic_cone"]["orient_err"])
    assert math.isnan(m["label_tp_errors"]["barrier"]["vel_err"])


def test_half_recall_ap():
    # 2 GT, 1 perfect pred -> rec 0.5, prec 1.0;
    # AP = 40 bins of (1-0.1) over 90 bins / 0.9 = 40/90
    gt = {"t0": [mkbox("car", (5, 0)), mkbox("car", (5, 20))]}
    pr = {"t0": [mkbox("car", (5, 0), score=0.9)]}
    md = accumulate(gt, pr, "car", 2.0)
    assert calc_ap(md) == pytest.approx(40.0 / 90.0)


def test_distance_thresholds_and_ate():
    gt = {"t0": [mkbox("car", (5, 0))]}
    pr = {"t0": [mkbox("car", (5, 1.5), score=0.9)]}
    m = evaluate_detection(gt, pr, EGO)
    aps = m["label_aps"]["car"]
    assert aps[0.5] == 0.0 and aps[1.0] == 0.0
    assert aps[2.0] == pytest.approx(1.0) and aps[4.0] == pytest.approx(1.0)
    assert m["label_tp_errors"]["car"]["trans_err"] == pytest.approx(1.5)


def test_orientation_error_and_barrier_period():
    gt = {"t0": [mkbox("car", (5, 0), yaw=0.0)]}
    pr = {"t0": [mkbox("car", (5, 0), score=0.9, yaw=0.3)]}
    m = evaluate_detection(gt, pr, EGO)
    assert m["label_tp_errors"]["car"]["orient_err"] == pytest.approx(0.3)
    # barrier: period pi — a near-pi flip is a small error
    gt = {"t0": [mkbox("barrier", (5, 0), yaw=0.0)]}
    pr = {"t0": [mkbox("barrier", (5, 0), score=0.9, yaw=math.pi - 0.2)]}
    m = evaluate_detection(gt, pr, EGO)
    assert m["label_tp_errors"]["barrier"]["orient_err"] == pytest.approx(0.2)


def test_scale_velocity_attribute_errors():
    gt = {"t0": [mkbox("car", (5, 0), size=(1, 1, 1), vel=(1, 0))]}
    pr = {"t0": [mkbox("car", (5, 0), score=0.9, size=(1, 1, 2), vel=(0, 0),
                       attr="vehicle.moving")]}
    m = evaluate_detection(gt, pr, EGO)
    e = m["label_tp_errors"]["car"]
    assert e["scale_err"] == pytest.approx(0.5)   # aligned IoU 0.5
    assert e["vel_err"] == pytest.approx(1.0)
    assert e["attr_err"] == pytest.approx(1.0)    # parked vs moving


def test_range_and_point_filters():
    gt = {"t0": [
        mkbox("car", (5, 0)),
        mkbox("car", (60, 0)),              # beyond 50 m: filtered
        mkbox("car", (10, 0), num_pts=0),   # zero points: filtered
    ]}
    pr = {"t0": [
        mkbox("car", (5, 0), score=0.9),
        mkbox("car", (60, 0), score=0.8),   # also filtered, not an FP
    ]}
    m = evaluate_detection(gt, pr, EGO)
    assert m["mean_dist_aps"]["car"] == pytest.approx(1.0)


def test_false_positive_lowers_ap():
    gt = {"t0": [mkbox("car", (5, 0)), mkbox("car", (5, 20))]}
    clean = {"t0": [mkbox("car", (5, 0), score=0.9),
                    mkbox("car", (5, 20), score=0.8)]}
    noisy = {"t0": clean["t0"] + [mkbox("car", (30, 0), score=0.85)]}
    ap_clean = calc_ap(accumulate(gt, clean, "car", 2.0))
    ap_noisy = calc_ap(accumulate(gt, {"t0": list(noisy["t0"])}, "car", 2.0))
    assert ap_clean == pytest.approx(1.0)
    assert ap_noisy < ap_clean


def test_greedy_matching_takes_nearest_and_each_gt_once():
    # two preds near one GT: only the nearer (higher-score-first) matches
    gt = {"t0": [mkbox("car", (5, 0))]}
    pr = {"t0": [mkbox("car", (5, 0.2), score=0.9),
                 mkbox("car", (5, 0.4), score=0.8)]}
    md = accumulate(gt, pr, "car", 2.0)
    # tp=[1,0] fp=[0,1] -> precision at rec=1.0 is 1.0 then FP halves it
    assert md.trans_err[-1] == pytest.approx(0.2)
    ap = calc_ap(md)
    assert 0 < ap <= 1.0


def test_no_predictions_and_no_gt():
    gt = {"t0": [mkbox("car", (5, 0))]}
    md = accumulate(gt, {"t0": []}, "car", 2.0)
    assert calc_ap(md) == 0.0
    assert calc_tp(md, "trans_err") == 1.0
    # class with zero GT: AP 0 by protocol
    md2 = accumulate({"t0": []}, {"t0": [mkbox("car", (5, 0), score=0.9)]},
                     "car", 2.0)
    assert calc_ap(md2) == 0.0


def test_quaternion_yaw():
    for yaw in (-2.5, -0.3, 0.0, 1.2, 3.0):
        q = [math.cos(yaw / 2), 0, 0, math.sin(yaw / 2)]
        assert quaternion_yaw(q) == pytest.approx(yaw)


def _synth_info(token, gt_boxes, gt_names, gt_attrs, yaw_ego=0.3,
                t_ego=(10.0, -4.0, 1.0)):
    c, s = math.cos(yaw_ego), math.sin(yaw_ego)
    ego2g = np.array([[c, -s, 0, t_ego[0]], [s, c, 0, t_ego[1]],
                      [0, 0, 1, t_ego[2]], [0, 0, 0, 1]])
    l2e = np.eye(4)
    l2e[:3, 3] = (0.5, 0.0, 1.8)
    return dict(
        sample_token=token,
        gt_boxes=np.asarray(gt_boxes, float),
        gt_names=np.asarray(gt_names),
        gt_attributes=np.asarray(gt_attrs),
        num_lidar_pts=np.full(len(gt_boxes), 12),
        num_radar_pts=np.zeros(len(gt_boxes), np.int64),
        car_from_global=np.linalg.inv(ego2g),
        ref_from_car=np.linalg.inv(l2e),
    )


def test_submission_roundtrip_scores_perfect(tmp_path):
    """generate_submission(preds == GT) scored against gt_from_infos of the
    same infos → mAP = NDS = 1 (both converters apply the same lidar→global
    chain)."""
    from unidistill_tpu.data.evaluate import generate_submission

    # lidar-frame 9D boxes (x, y, z, dx, dy, dz, yaw, vx, vy); vel=0 so the
    # submission's attribute heuristic emits 'vehicle.parked'
    boxes = [[8.0, 2.0, -0.5, 4.2, 1.9, 1.6, 0.7, 0.0, 0.0],
             [-6.0, 5.0, -0.2, 4.0, 1.8, 1.5, -1.1, 0.0, 0.0]]
    infos = [_synth_info("tokA", boxes, ["vehicle.car"] * 2,
                         ["vehicle.parked"] * 2)]
    preds = [dict(
        boxes=np.asarray(boxes, float),
        scores=np.array([0.9, 0.8]),
        labels=np.array([0, 0]),  # 0-based 'car'
    )]
    path = generate_submission(preds, infos, str(tmp_path))
    m = evaluate_submission_native(
        path, infos, output_path=str(tmp_path / "metrics.json"))
    assert m["mean_dist_aps"]["car"] == pytest.approx(1.0)
    e = m["label_tp_errors"]["car"]
    for k in ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err"):
        assert e[k] == pytest.approx(0.0, abs=1e-6), (k, e[k])
    with open(tmp_path / "metrics.json") as f:
        dumped = json.load(f)
    assert dumped["mean_ap"] == pytest.approx(m["mean_ap"])


def test_gt_from_infos_velocity_rotates_to_global():
    from unidistill_tpu.data.dataset import MAP_GENERAL_TO_DETECTION

    # ego yaw 90°: lidar-frame velocity (1, 0) becomes global (0, 1)
    info = _synth_info(
        "tokV", [[5.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 1.0, 0.0]],
        ["vehicle.car"], ["vehicle.moving"], yaw_ego=math.pi / 2,
    )
    gt, ego = gt_from_infos([info], MAP_GENERAL_TO_DETECTION)
    v = gt["tokV"][0]["velocity"]
    assert v[0] == pytest.approx(0.0, abs=1e-9)
    assert v[1] == pytest.approx(1.0)
    assert gt["tokV"][0]["num_pts"] == 12
    # 'ignore' categories dropped
    info2 = _synth_info("tokI", [[5, 0, 0, 1, 1, 1, 0, 0, 0]], ["animal"],
                        [""])
    gt2, _ = gt_from_infos([info2], MAP_GENERAL_TO_DETECTION)
    assert gt2["tokI"] == []


def test_max_recall_ind_gates_tp():
    md = MetricData.no_predictions()
    assert md.max_recall_ind == 0
    assert calc_tp(md, "trans_err") == 1.0
    assert len(DIST_THS) == 4
