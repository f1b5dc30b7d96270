"""LiDAR+camera fusion BEVFusion CenterHead experiment.

ref …BEVFusion_nuscenes_centerhead_fusion_exp.py:177-215.
"""
from unidistill_tpu.configs.nuscenes import fusion_exp
from unidistill_tpu.exps.base_cli import run_cli

if __name__ == "__main__":
    run_cli(fusion_exp())
