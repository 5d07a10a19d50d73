"""Monocular KITTI driver (reference: Examples/Monocular/mono_kitti.cc).

Usage: python examples/mono_kitti.py <settings.yaml> <sequence_dir>
"""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from c_orb_slam_tpu.config import Sensor, load_yaml
from c_orb_slam_tpu.datasets import load_kitti
from common import run_sequence, standard_parser

if __name__ == "__main__":
    args = standard_parser(__doc__).parse_args()
    cfg = load_yaml(args.settings, Sensor.MONOCULAR)
    stamps, left, _ = load_kitti(args.sequence, stereo=False)
    run_sequence(cfg, stamps, left, args=args, kitti_format=True)
