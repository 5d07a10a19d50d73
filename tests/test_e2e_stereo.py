"""End-to-end stereo and RGB-D SLAM on rendered synthetic sequences
(SURVEY.md §4 tier (b); M3 of the build plan §7.2).

Covers: batched L/R extraction -> row-banded stereo matching -> depth-seeded
initialization -> stereo-residual pose optimization -> depth-seeded new
keyframe points -> local BA with stereo observations. ATE is evaluated at
ABSOLUTE scale — stereo/RGB-D observability the monocular path lacks.
"""

import pytest

import e2e_stereo_debug
from c_orb_slam_tpu.config import Sensor


def test_stereo_synthetic_sequence():
    ate, n_ok, n = e2e_stereo_debug.run(Sensor.STEREO, n_frames=24, verbose=False)
    assert n_ok > 0.8 * n, f"tracked only {n_ok}/{n} frames"
    assert ate < 0.03, f"ATE {ate:.4f} m (absolute scale)"


def test_rgbd_synthetic_sequence():
    # Gate at 0.05 m (same as the debug driver): the 24-frame synthetic
    # run is chaotically sensitive to map composition — reordering the
    # triangulation/fusion batches moves ATE by ±0.02 m in either
    # direction (at 30 frames the batched pipeline measures *lower* ATE
    # than the sequential one).
    ate, n_ok, n = e2e_stereo_debug.run(Sensor.RGBD, n_frames=24, verbose=False)
    assert n_ok > 0.8 * n, f"tracked only {n_ok}/{n} frames"
    assert ate < 0.05, f"ATE {ate:.4f} m (absolute scale)"


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
