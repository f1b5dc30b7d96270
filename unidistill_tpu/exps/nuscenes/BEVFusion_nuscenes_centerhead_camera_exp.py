"""Camera-only BEVFusion CenterHead experiment.

ref …BEVFusion_nuscenes_centerhead_camera_exp.py:7-37 (fusion exp minus lidar
encoder; lr 2e-4).
"""
from unidistill_tpu.configs.nuscenes import camera_exp
from unidistill_tpu.exps.base_cli import run_cli

if __name__ == "__main__":
    run_cli(camera_exp())
