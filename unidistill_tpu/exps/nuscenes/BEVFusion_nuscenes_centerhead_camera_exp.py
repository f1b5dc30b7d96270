"""Camera-only BEVFusion CenterHead experiment.

ref …BEVFusion_nuscenes_centerhead_camera_exp.py:7-37 (fusion exp minus lidar
encoder; lr 2e-4).
"""
# allow `python unidistill_tpu/exps/nuscenes/<exp>.py` from a source checkout:
# the interpreter puts the SCRIPT's dir on sys.path, not the repo root
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[3]))

from unidistill_tpu.configs.nuscenes import camera_exp
from unidistill_tpu.exps.base_cli import run_cli

if __name__ == "__main__":
    run_cli(camera_exp())
