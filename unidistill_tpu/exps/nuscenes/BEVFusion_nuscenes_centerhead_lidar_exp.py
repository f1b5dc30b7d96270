"""LiDAR-only BEVFusion CenterHead experiment.

ref exps/multisensor_fusion/nuscenes/BEVFusion/BEVFusion_nuscenes_centerhead_lidar_exp.py:7-35
(fusion exp minus camera encoder; lr 1e-3, batch 4/device, 20 epochs).
"""
from unidistill_tpu.configs.nuscenes import lidar_exp
from unidistill_tpu.exps.base_cli import run_cli

if __name__ == "__main__":
    run_cli(lidar_exp())
