"""Full loop-closure integration test (M4): outward-facing stereo orbit
that revisits its start sector in its last ~35 frames.

Exercises the flagship capability END TO END, in the default suite: BoW
loop detection with covisibility consistency -> Sim3 RANSAC + GN polish
-> loop correction/fusion -> essential-graph optimization -> background
snapshot-epoch global BA (chunked one LM step per frame, applied with
spanning-tree replay) -> trajectory reconstruction through corrected
keyframe poses.

Counterfactuals measured 2026-08-21 (CPU, world_n=1400): no loop ATE
0.762 m; loop + essential graph only 0.598 m; + background GBA 0.252 m
(improved to ~0.04 once the solve advanced strictly once per frame —
late frames then track against the settled result; the same sequence
measured 0.043 m ON THE REAL CHIP, 240/240 tracked, loop closed,
GBA applied). The ATE gate (0.4 m) FAILS if loop correction stops
working.

~2.5-3 min on CPU with a warm compile cache.
"""

import numpy as np
import pytest

import e2e_loop_debug
from c_orb_slam_tpu.config import Sensor


def test_stereo_orbit_closes_loop_nonblocking():
    ate, n_loops, n_ok, n = e2e_loop_debug.run(
        Sensor.STEREO, n_frames=240, verbose=False, world_n=1400
    )
    run = e2e_loop_debug.run
    assert n_ok > 0.9 * n, f"tracked only {n_ok}/{n} frames"
    assert n_loops >= 1, "no loop closed"
    # Well below the measured no-loop counterfactual (0.76 m): the gate
    # fails if loop correction stops improving the trajectory.
    assert ate < 0.4, f"ATE {ate:.4f} m (absolute; no-loop baseline ~0.76)"
    # The background snapshot-epoch global BA must have completed and
    # been applied (serial-guarded writes + spanning-tree replay).
    assert run.last_n_gba_applied >= 1, "background GBA never applied"
    # Non-blocking property: the global BA is SPREAD across frames (one
    # jitted LM chunk per tracked frame), not solved inline — with the
    # old synchronous in-loop GBA the whole ~20-30 s solve landed on the
    # correction frame and gba_at would equal loops_at. The schedule is
    # 10+10 LM chunks + classify + fetch, so the apply must land well
    # after the loop event. (A wall-clock bound here was flaky on cold
    # CI runs: in-process jit compiles spike arbitrary frames.)
    # The background solve advances exactly one chunk per frame, so the
    # apply lands ~21 frames (10+10 LM chunks + classify + fetch) after
    # the correction — the old inline GBA solved on the correction frame
    # itself. When the loop fires near the sequence end the apply may
    # land in shutdown's drain instead (gba_at then stays empty).
    # On the multi-device CPU mesh the wired path is _ShardedGbaJob —
    # one SPMD solve whose readback may land within a frame or two; the
    # chunk-spread property applies to the single-device _GbaJob only.
    if run.last_gba_at and run.last_gba_kind == "_GbaJob":
        spread = run.last_gba_at[0] - run.last_loops_at[0]
        assert spread >= 5, (
            f"GBA applied only {spread} frames after the loop event — "
            f"the solve was not spread (loop at {run.last_loops_at[0]}, "
            f"applied at {run.last_gba_at[0]})"
        )
    # And the post-loop advance frames each stay near the run median:
    # every frame between correction and apply carries ONE chunk (a fuse
    # block, an essential-graph GN step, or a GBA LM step).
    t = np.asarray(run.last_frame_times)
    lo = run.last_loops_at[0] + 1
    hi = run.last_gba_at[0] if run.last_gba_at else len(t)
    med = float(np.median(t[6:lo]))
    # On a COLD suite run each staged program (fuse block, pose-graph
    # chunk/dispatch, finalize, first lm_step) pays its jit compile
    # inside exactly ONE frame; allow two such outliers and bound the
    # REST — a solve loading single frames makes many frames slow, and
    # the spread assertion above already catches an inline solve.
    win = np.sort(t[lo:hi])[::-1] if hi > lo else np.zeros(1)
    sustained = float(win[2]) if len(win) > 2 else float(win[0])
    assert sustained < max(8 * med, 30.0), (
        f"post-loop frames sustain {sustained:.1f}s (median {med:.2f}s): "
        "the background solve is loading single frames"
    )
    # The correction frame itself carries only the fused propagate
    # program + ONE fuse-block dispatch (round 4 ran the whole
    # correction inline: 8.2 s on chip = ~80 dropped frames at 10 Hz;
    # measured now ~0.75 s ≈ 1x the median chip frame). The 30 s floor
    # is the cold-compile allowance for _propagate_program on CI.
    t_corr = float(t[run.last_loops_at[0]])
    assert t_corr < max(8 * med, 30.0), (
        f"the correction frame took {t_corr:.1f}s (median {med:.2f}s): "
        "the correction is running inline again"
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


def test_mono_orbit_closes_loop_with_scale():
    """Monocular loop closure — the Sim3 path with FREE scale (stereo
    fixes scale; mono must estimate and correct scale drift,
    reference: LoopClosing.cc:38-41 mbFixScale)."""
    ate, n_loops, n_ok, n = e2e_loop_debug.run(
        Sensor.MONOCULAR, n_frames=240, verbose=False, world_n=1400
    )
    run = e2e_loop_debug.run
    assert n_ok > 0.9 * n, f"tracked only {n_ok}/{n} frames"
    assert n_loops >= 1, "no loop closed"
    assert ate < 0.4, f"scaled ATE {ate:.4f} (measured ~0.08 healthy)"
    assert run.last_n_gba_applied >= 1, "background GBA never applied"
