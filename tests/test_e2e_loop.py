"""Full loop-closure integration test (M4): outward-facing stereo orbit that
revisits its start sector after ~220 frames.

Exercises: BoW loop detection with covisibility consistency -> Sim3 RANSAC +
GN polish -> loop correction/fusion -> essential-graph optimization ->
global BA -> trajectory reconstruction through corrected keyframe poses.

~13 minutes on CPU, so opt-in: RUN_SLOW=1 python -m pytest tests/test_e2e_loop.py
Reference result (2026-08-17): 240/240 tracked, 1 loop closed at frame 220,
ATE 0.0785 m absolute over a ~50 m orbit.
"""

import os

import pytest

import e2e_loop_debug
from c_orb_slam_tpu.config import Sensor


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="slow (~13 min); set RUN_SLOW=1"
)
def test_stereo_orbit_closes_loop():
    ate, n_loops, n_ok, n = e2e_loop_debug.run(Sensor.STEREO, verbose=False)
    assert n_ok > 0.9 * n, f"tracked only {n_ok}/{n} frames"
    assert n_loops >= 1, "no loop closed"
    assert ate < 0.2, f"ATE {ate:.4f} m (absolute)"


if __name__ == "__main__":
    os.environ.setdefault("RUN_SLOW", "1")
    pytest.main([__file__, "-q", "-x"])
