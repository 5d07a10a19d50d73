"""Stereo EuRoC driver with online rectification (reference:
Examples/Stereo/stereo_euroc.cc — LEFT.*/RIGHT.* K, D, R, P from the YAML,
initUndistortRectifyMap + per-frame remap :72-137).

Usage: python examples/stereo_euroc.py <settings.yaml> <mav0_dir>
"""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from c_orb_slam_tpu.config import Sensor, load_yaml, load_yaml_raw
from c_orb_slam_tpu.datasets import load_euroc
from c_orb_slam_tpu.frontend.rectify import StereoRectifier
from common import run_sequence, standard_parser


def _side(kv, prefix):
    return {
        "K": np.asarray(kv[f"{prefix}.K"]),
        "D": np.asarray(kv[f"{prefix}.D"]).ravel(),
        "R": np.asarray(kv[f"{prefix}.R"]),
        "P": np.asarray(kv[f"{prefix}.P"]),
    }


if __name__ == "__main__":
    args = standard_parser(__doc__).parse_args()
    cfg = load_yaml(args.settings, Sensor.STEREO)
    kv = load_yaml_raw(args.settings)
    size = (int(kv["LEFT.width"]), int(kv["LEFT.height"]))
    rectifier = StereoRectifier(_side(kv, "LEFT"), _side(kv, "RIGHT"), size)
    stamps, left, right = load_euroc(args.sequence, stereo=True)
    run_sequence(cfg, stamps, left, right_paths=right, rectifier=rectifier, args=args)
