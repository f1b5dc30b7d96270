"""LiDAR-only BEVFusion CenterHead experiment.

ref exps/multisensor_fusion/nuscenes/BEVFusion/BEVFusion_nuscenes_centerhead_lidar_exp.py:7-35
(fusion exp minus camera encoder; lr 1e-3, batch 4/device, 20 epochs).
"""
# allow `python unidistill_tpu/exps/nuscenes/<exp>.py` from a source checkout:
# the interpreter puts the SCRIPT's dir on sys.path, not the repo root
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[3]))

from unidistill_tpu.configs.nuscenes import lidar_exp
from unidistill_tpu.exps.base_cli import run_cli

if __name__ == "__main__":
    run_cli(lidar_exp())
