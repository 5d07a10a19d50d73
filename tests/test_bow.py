"""Vocabulary + keyframe-database tests (M4; reference: Thirdparty/DBoW2,
src/KeyFrameDatabase.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from c_orb_slam_tpu.bow import vocab as vocab_mod
from c_orb_slam_tpu.bow.database import KeyFrameDatabase, aggregate_bow


def _rand_descs(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)


def _perturb(rng, d, bits=8):
    """Flip `bits` random bits in each descriptor."""
    out = d.copy()
    for i in range(len(out)):
        for _ in range(bits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            out[i, w] ^= np.uint32(1 << b)
    return out


@pytest.fixture(scope="module")
def voc():
    rng = np.random.default_rng(0)
    images = [_rand_descs(rng, 120) for _ in range(12)]
    return vocab_mod.train_vocabulary(images, k=8, L=3, levels_up=1, seed=1)


def test_transform_shapes_and_determinism(voc):
    rng = np.random.default_rng(3)
    d = _rand_descs(rng, 64)
    fb1 = vocab_mod.transform(voc, jnp.asarray(d), jnp.ones(64, bool))
    fb2 = vocab_mod.transform(voc, jnp.asarray(d), jnp.ones(64, bool))
    assert np.array_equal(np.asarray(fb1.word), np.asarray(fb2.word))
    w = np.asarray(fb1.word)
    assert ((w >= 0) & (w < voc.n_words)).all()
    # node ids live at the coarser grouping level
    node = np.asarray(fb1.node)
    assert ((node >= 0) & (node < voc.k ** voc.node_level())).all()
    # invalid descriptors get word -1
    fb3 = vocab_mod.transform(voc, jnp.asarray(d), jnp.zeros(64, bool))
    assert (np.asarray(fb3.word) == -1).all()


def test_similar_frames_score_higher(voc):
    rng = np.random.default_rng(4)
    base = _rand_descs(rng, 100)
    near = _perturb(rng, base, bits=6)  # same scene, slight noise
    far = _rand_descs(rng, 100)

    db = KeyFrameDatabase(voc, max_keyframes=8, cap=128)
    for k, d in enumerate([near, far]):
        fb = vocab_mod.transform(voc, jnp.asarray(d), jnp.ones(len(d), bool))
        db.add(k, aggregate_bow(fb, 128))

    q = vocab_mod.transform(voc, jnp.asarray(base), jnp.ones(100, bool))
    score, n_shared = db.scores(aggregate_bow(q, 128))
    assert score[0] > 2.0 * max(score[1], 1e-6), (score[0], score[1])
    assert n_shared[0] > n_shared[1]
    # self-similarity bound: score in [0, 1] for L1-normalized vectors
    assert 0.0 <= score[0] <= 1.0 + 1e-5


def test_save_load_roundtrip(voc, tmp_path):
    p = str(tmp_path / "voc.npz")
    vocab_mod.save(voc, p)
    voc2 = vocab_mod.load(p)
    rng = np.random.default_rng(5)
    d = _rand_descs(rng, 32)
    fb1 = vocab_mod.transform(voc, jnp.asarray(d), jnp.ones(32, bool))
    fb2 = vocab_mod.transform(voc2, jnp.asarray(d), jnp.ones(32, bool))
    assert np.array_equal(np.asarray(fb1.word), np.asarray(fb2.word))
    np.testing.assert_allclose(
        np.asarray(fb1.weight), np.asarray(fb2.weight), rtol=1e-6
    )


def test_reloc_candidates_rank_true_match(voc):
    rng = np.random.default_rng(6)

    class MapStub:
        def covisible_keyframes(self, k, n=10, min_weight=15):
            return []

    db = KeyFrameDatabase(voc, max_keyframes=16, cap=128)
    frames = [_rand_descs(rng, 80) for _ in range(6)]
    for k, d in enumerate(frames):
        fb = vocab_mod.transform(voc, jnp.asarray(d), jnp.ones(len(d), bool))
        db.add(k, aggregate_bow(fb, 128))
    # query = noisy copy of frame 3
    q = _perturb(rng, frames[3], bits=5)
    fb = vocab_mod.transform(voc, jnp.asarray(q), jnp.ones(len(q), bool))
    cands = db.detect_reloc_candidates(aggregate_bow(fb, 128), MapStub())
    assert 3 in cands


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
