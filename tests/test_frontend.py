"""Tests for the ORB frontend: FAST, selection, orientation, descriptors,
Hamming matching (SURVEY.md §4 tier (a)/(b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_orb_slam_tpu.config import OrbConfig
from c_orb_slam_tpu.ops import extract, fast, hamming, match, orient

from synthetic import shifted, textured_image


class TestHamming:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(1)
        bits = jnp.asarray(rng.integers(0, 2, size=(16, 256)), dtype=jnp.uint8)
        packed = hamming.pack_bits(bits)
        assert packed.shape == (16, 8) and packed.dtype == jnp.uint32
        np.testing.assert_array_equal(hamming.unpack_bits(packed), bits)

    def test_distance_matches_bit_count(self):
        rng = np.random.default_rng(2)
        a_bits = rng.integers(0, 2, size=(8, 256))
        b_bits = rng.integers(0, 2, size=(8, 256))
        a = hamming.pack_bits(jnp.asarray(a_bits, jnp.uint8))
        b = hamming.pack_bits(jnp.asarray(b_bits, jnp.uint8))
        expect = np.sum(a_bits != b_bits, axis=1)
        np.testing.assert_array_equal(hamming.distance(a, b), expect)
        d = hamming.distance_matrix(a, b)
        assert d.shape == (8, 8)
        np.testing.assert_array_equal(np.diagonal(d), expect)

    def test_best_two(self):
        d = jnp.array([[5, 3, 9], [1, 2, 0]], dtype=jnp.int32)
        best, idx, second = hamming.best_two(d)
        np.testing.assert_array_equal(best, [3, 0])
        np.testing.assert_array_equal(idx, [1, 2])
        np.testing.assert_array_equal(second, [5, 1])


class TestFast:
    def test_detects_synthetic_corner(self):
        img = np.zeros((64, 64), dtype=np.float32)
        img[20:40, 20:40] = 200.0  # a bright square: 4 strong corners
        corner, score = fast.fast_response(jnp.asarray(img), 20.0)
        assert np.asarray(score).max() > 0
        ys, xs = np.nonzero(np.asarray(fast.nms3(score)))
        # All NMS'd detections cluster near the square's corners.
        corners = np.array([[20, 20], [20, 39], [39, 20], [39, 39]])
        for y, x in zip(ys, xs):
            assert np.min(np.abs(corners - [y, x]).sum(axis=1)) <= 4

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        corner, score = fast.fast_response(img, 20.0)
        assert not bool(jnp.any(corner))

    def test_detect_respects_border(self):
        img = jnp.asarray(textured_image(96, 128, seed=3))
        score = fast.detect(img, 20.0, 7.0, border=16)
        s = np.asarray(score)
        assert s[:16, :].max() == 0 and s[-16:, :].max() == 0
        assert s[:, :16].max() == 0 and s[:, -16:].max() == 0
        assert s.max() > 0


class TestSelection:
    def test_topk_budget_and_bounds(self):
        img = jnp.asarray(textured_image(240, 320, seed=4))
        score = fast.detect(img, 20.0, 7.0, border=16)
        yx, resp, valid = extract.select_keypoints(score, 200, 30)
        assert yx.shape == (200, 2)
        n = int(valid.sum())
        assert n > 50
        yxv = np.asarray(yx[:n])
        assert yxv[:, 0].min() >= 0 and yxv[:, 0].max() < 240
        assert yxv[:, 1].min() >= 0 and yxv[:, 1].max() < 320

    def test_spatial_balance_cap(self):
        # A single dominant cell cannot claim more than k_per_cell slots.
        score = np.zeros((60, 60), dtype=np.float32)
        score[5:25, 5:25] = np.random.default_rng(0).uniform(
            1, 100, size=(20, 20)
        ).astype(np.float32)
        yx, resp, valid = extract.select_keypoints(
            jnp.asarray(score), 50, cell=30, k_per_cell=4
        )
        assert int(valid.sum()) <= 8  # at most 4 per 30px cell, 2 cells hit


class TestOrientation:
    def test_gradient_patch_angle(self):
        # Intensity increasing along +x -> centroid to the right -> angle 0.
        img = jnp.asarray(
            np.tile(np.arange(64, dtype=np.float32), (64, 1))
        )
        ang = orient.ic_angle(img, jnp.array([[32, 32]]), 15)
        assert abs(float(ang[0])) < 0.1
        # Increasing along +y -> angle pi/2.
        ang2 = orient.ic_angle(img.T, jnp.array([[32, 32]]), 15)
        assert abs(float(ang2[0]) - np.pi / 2) < 0.1


class TestExtract:
    cfg = OrbConfig(n_features=300, n_levels=4)

    def test_extract_shapes_and_counts(self):
        img = jnp.asarray(textured_image(240, 320, seed=5))
        kps = jax.jit(lambda im: extract.extract_orb(im, self.cfg))(img)
        total = sum(self.cfg.features_per_level())
        assert kps.xy.shape == (total, 2)
        assert kps.desc.shape == (total, 8)
        n = int(kps.count())
        assert n > 100, f"only {n} keypoints"
        v = np.asarray(kps.valid)
        xy = np.asarray(kps.xy)[v]
        assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240

    def test_descriptors_distinctive(self):
        img = jnp.asarray(textured_image(240, 320, seed=6))
        kps = extract.extract_orb(img, self.cfg)
        v = np.asarray(kps.valid)
        d = np.asarray(hamming.distance_matrix(kps.desc, kps.desc))[v][:, v]
        n = d.shape[0]
        off_diag = d[~np.eye(n, dtype=bool)]
        # Distinct corners should be far apart in Hamming space on average.
        assert off_diag.mean() > 60, off_diag.mean()

    def test_match_shifted_image(self):
        """End-to-end frontend check: matching a shifted copy recovers the
        shift for the vast majority of matches."""
        base = textured_image(240, 320, seed=7)
        img1 = jnp.asarray(base)
        img2 = jnp.asarray(shifted(base, 4, 9))
        k1 = extract.extract_orb(img1, self.cfg)
        k2 = extract.extract_orb(img2, self.cfg)
        m = match.search_for_initialization(
            k1.xy, k1.desc, k1.valid, k1.angle,
            k2.xy, k2.desc, k2.valid, k2.angle, k2.octave,
            window=50.0, max_dist=60, nn_ratio=0.8,
        )
        valid = np.asarray(m.valid)
        assert valid.sum() > 30, f"only {valid.sum()} matches"
        d_xy = np.asarray(k2.xy)[np.asarray(m.idx)[valid]] - np.asarray(k1.xy)[valid]
        err = np.abs(d_xy - np.array([9.0, 4.0])).max(axis=1)
        inlier_frac = (err < 2.0).mean()
        assert inlier_frac > 0.8, f"inlier fraction {inlier_frac}"


class TestRotationConsistency:
    def test_filters_outlier_rotations(self):
        n = 100
        rng = np.random.default_rng(8)
        angles_q = jnp.asarray(rng.uniform(0, 2 * np.pi, n), jnp.float32)
        # 90 matches rotated by ~0.5 rad, 10 outliers random.
        delta = np.full(n, 0.5, dtype=np.float32)
        delta[:10] = rng.uniform(0, 2 * np.pi, 10)
        angles_t = angles_q - jnp.asarray(delta)
        valid = jnp.ones(n, dtype=bool)
        kept = match.rotation_consistency(angles_q, angles_t, valid)
        kept = np.asarray(kept)
        assert kept[10:].all()
        assert kept[:10].sum() <= 3


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
