"""Monocular TUM driver (reference: Examples/Monocular/mono_tum.cc).

Usage: python examples/mono_tum.py <settings.yaml> <sequence_dir>
"""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from c_orb_slam_tpu.config import Sensor, load_yaml
from c_orb_slam_tpu.datasets import load_tum_rgb
from common import run_sequence, standard_parser

if __name__ == "__main__":
    args = standard_parser(__doc__).parse_args()
    cfg = load_yaml(args.settings, Sensor.MONOCULAR)
    stamps, paths = load_tum_rgb(args.sequence)
    run_sequence(cfg, stamps, paths, args=args)
