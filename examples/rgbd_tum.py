"""RGB-D TUM driver (reference: Examples/RGB-D/rgbd_tum.cc).

Usage: python examples/rgbd_tum.py <settings.yaml> <sequence_dir> --associations <file>
"""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from c_orb_slam_tpu.config import Sensor, load_yaml
from c_orb_slam_tpu.datasets import load_tum_associations
from common import run_sequence, standard_parser

if __name__ == "__main__":
    p = standard_parser(__doc__)
    p.add_argument("--associations", required=True)
    args = p.parse_args()
    cfg = load_yaml(args.settings, Sensor.RGBD)
    stamps, rgb, depth = load_tum_associations(args.sequence, args.associations)
    run_sequence(cfg, stamps, rgb, depth_paths=depth, args=args)
