"""Monocular EuRoC driver (reference: Examples/Monocular/mono_euroc.cc).

Usage: python examples/mono_euroc.py <settings.yaml> <mav0_dir>
"""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from c_orb_slam_tpu.config import Sensor, load_yaml
from c_orb_slam_tpu.datasets import load_euroc
from common import run_sequence, standard_parser

if __name__ == "__main__":
    args = standard_parser(__doc__).parse_args()
    cfg = load_yaml(args.settings, Sensor.MONOCULAR)
    stamps, left, _ = load_euroc(args.sequence, stereo=False)
    run_sequence(cfg, stamps, left, args=args)
