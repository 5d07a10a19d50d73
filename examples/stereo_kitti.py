"""Stereo KITTI driver (reference: Examples/Stereo/stereo_kitti.cc).

Usage: python examples/stereo_kitti.py <settings.yaml> <sequence_dir>
"""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from c_orb_slam_tpu.config import Sensor, load_yaml
from c_orb_slam_tpu.datasets import load_kitti
from common import run_sequence, standard_parser

if __name__ == "__main__":
    args = standard_parser(__doc__).parse_args()
    cfg = load_yaml(args.settings, Sensor.STEREO)
    stamps, left, right = load_kitti(args.sequence, stereo=True)
    run_sequence(cfg, stamps, left, right_paths=right, args=args, kitti_format=True)
