"""Frame construction: extraction + undistortion (+ stereo depth).

Reference: src/Frame.cc — the three constructors (:61 stereo, :119 RGBD,
:174 mono) run ORB extraction (two CPU threads for stereo L/R,
Frame.cc:78-81), keypoint undistortion (:404), stereo matching (:466) and
grid binning (:230).

TPU-native: one jitted program per sensor type; the L/R "thread pair"
becomes a batched 2-image extraction; the 64x48 search grid is not needed
(matching uses dense masked distance matrices, ops/match.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from c_orb_slam_tpu.config import SlamConfig
from c_orb_slam_tpu.geometry import camera
from c_orb_slam_tpu.ops import extract, hamming, match


class FrameData(NamedTuple):
    """Per-frame fixed-capacity data (device arrays)."""

    xy: jnp.ndarray  # (N, 2) undistorted level-0 coords
    xy_raw: jnp.ndarray  # (N, 2) raw (distorted) coords
    octave: jnp.ndarray  # (N,)
    angle: jnp.ndarray  # (N,)
    desc: jnp.ndarray  # (N, 8) uint32
    valid: jnp.ndarray  # (N,)
    ur: jnp.ndarray  # (N,) right-image u coordinate (-1 = mono/no match)
    depth: jnp.ndarray  # (N,) depth (-1 = none)


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_mono(image: jnp.ndarray, cfg: SlamConfig) -> FrameData:
    kps = extract.extract_orb(image, cfg.orb, cfg.vocabulary.seed)
    K = camera.intrinsics_array(cfg.camera)
    dist = camera.distortion_array(cfg.camera)
    xy_u = camera.undistort_points(kps.xy, K, dist)
    n = kps.xy.shape[0]
    return FrameData(
        xy=xy_u,
        xy_raw=kps.xy,
        octave=kps.octave,
        angle=kps.angle,
        desc=kps.desc,
        valid=kps.valid,
        ur=jnp.full((n,), -1.0, jnp.float32),
        depth=jnp.full((n,), -1.0, jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_rgbd(
    image: jnp.ndarray, depth_map: jnp.ndarray, cfg: SlamConfig
) -> FrameData:
    """RGB-D: read depth at keypoint locations, synthesize the virtual
    right coordinate ur = u - bf/d (reference: Frame.cc:643-664)."""
    f = build_mono(image, cfg)
    yx = jnp.stack(
        [
            jnp.clip(jnp.round(f.xy_raw[:, 1]).astype(jnp.int32), 0, depth_map.shape[0] - 1),
            jnp.clip(jnp.round(f.xy_raw[:, 0]).astype(jnp.int32), 0, depth_map.shape[1] - 1),
        ],
        axis=1,
    )
    d = depth_map[yx[:, 0], yx[:, 1]] * (1.0 / cfg.tracking.depth_map_factor)
    has = d > 0
    ur = jnp.where(has, f.xy[:, 0] - cfg.camera.bf / jnp.maximum(d, 1e-6), -1.0)
    return f._replace(depth=jnp.where(has, d, -1.0), ur=ur)


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_stereo(
    left: jnp.ndarray, right: jnp.ndarray, cfg: SlamConfig
) -> FrameData:
    """Stereo: extract on both images, row-banded Hamming match, subpixel
    disparity -> depth (reference: Frame.cc:466-640 ComputeStereoMatches).

    The reference's per-row candidate tables + per-keypoint SAD refinement
    become: one masked (L, R) distance matrix with a row-band + disparity
    window mask, then parabola refinement on descriptor distances of
    left/right disparity neighbors is approximated by direct matching
    (the dominant accuracy term is the detector's subpixel position).
    """
    kl = extract.extract_orb(left, cfg.orb, cfg.vocabulary.seed)
    kr = extract.extract_orb(right, cfg.orb, cfg.vocabulary.seed)
    K = camera.intrinsics_array(cfg.camera)
    dist = camera.distortion_array(cfg.camera)
    # Rectified stereo: keypoints used as-is (reference skips undistortion
    # for stereo, Frame.cc:407-411 assumes rectified input).
    xy_u = kl.xy

    # Row band: |vL - vR| <= 2 * scale(octave); disparity in (minD, maxD].
    sf = jnp.asarray(cfg.orb.scale_factors(), jnp.float32)
    r_band = 2.0 * sf[kl.octave]
    dv = jnp.abs(kl.xy[:, 1:2] - kr.xy[None, :, 1])
    band_ok = dv <= r_band[:, None]
    disp = kl.xy[:, 0:1] - kr.xy[None, :, 0]
    # Disparity bounds: minZ = baseline -> maxD = fx (reference:
    # Frame.cc:470-473).
    disp_ok = (disp > 0.0) & (disp <= cfg.camera.fx)
    oct_ok = jnp.abs(kl.octave[:, None] - kr.octave[None, :]) <= 1
    mask = band_ok & disp_ok & oct_ok

    m = match.match(
        kl.desc, kr.desc, kl.valid, kr.valid, pair_mask=mask,
        max_dist=cfg.matcher.th_high, nn_ratio=1.0, unique_targets=False,
    )
    ur = jnp.where(m.valid, kr.xy[m.idx, 0], -1.0)
    disparity = jnp.maximum(xy_u[:, 0] - ur, 0.01)
    depth = jnp.where(m.valid, cfg.camera.bf / disparity, -1.0)
    good = m.valid & (depth > 0)
    return FrameData(
        xy=xy_u,
        xy_raw=kl.xy,
        octave=kl.octave,
        angle=kl.angle,
        desc=kl.desc,
        valid=kl.valid,
        ur=jnp.where(good, ur, -1.0),
        depth=jnp.where(good, depth, -1.0),
    )
