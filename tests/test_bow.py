"""Vocabulary + keyframe-database tests (M4; reference: Thirdparty/DBoW2,
src/KeyFrameDatabase.cc)."""

import os

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


def test_dbow2_text_roundtrip(tmp_path):
    """Write a tiny vocabulary in the DBoW2 text format and check
    load_dbow2_text + transform against a hand-computed descent
    (format spec: reference TemplatedVocabulary.h:1338-1424 — header
    `k L scoring weighting`, then `parent is_leaf d0..d31 weight` per
    node in creation order, ids implicit from 1)."""
    import numpy as np
    from c_orb_slam_tpu.bow.vocab import load_dbow2_text, transform

    def dline(parent, is_leaf, byte, weight):
        d = " ".join([str(byte)] * 32)
        return f"{parent} {int(is_leaf)} {d} {weight}"

    # k=2, L=2. Node ids in file order: 1=A, 2=B (children of root 0),
    # 3=A0, 4=A1 (children of A), 5=B0, 6=B1 (children of B).
    lines = [
        "2 2 0 0",
        dline(0, 0, 0x00, 0.0),    # A: all zeros
        dline(0, 0, 0xFF, 0.0),    # B: all ones
        dline(1, 1, 0x00, 0.5),    # A0
        dline(1, 1, 0x0F, 0.25),   # A1
        dline(2, 1, 0xF0, 0.75),   # B0
        dline(2, 1, 0xFF, 1.0),    # B1
    ]
    p = tmp_path / "voc.txt"
    p.write_text("\n".join(lines) + "\n")

    voc = load_dbow2_text(str(p), levels_up=1)
    assert voc.k == 2 and voc.L == 2 and voc.n_words == 4
    np.testing.assert_allclose(
        np.asarray(voc.word_weight), [0.5, 0.25, 0.75, 1.0]
    )
    # Dense layout: level 0 = [A, B], level 1 = [A0, A1, B0, B1].
    lvl0 = np.asarray(voc.levels[0]).view(np.uint8).reshape(2, 32)
    lvl1 = np.asarray(voc.levels[1]).view(np.uint8).reshape(4, 32)
    assert (lvl0[0] == 0x00).all() and (lvl0[1] == 0xFF).all()
    assert (lvl1[1] == 0x0F).all() and (lvl1[2] == 0xF0).all()

    # Hand-computed descents: each query is nearest to exactly one leaf.
    queries8 = np.stack([
        np.full(32, 0x00, np.uint8),   # -> A -> A0 (word 0)
        np.full(32, 0x1F, np.uint8),   # -> A (dist 160 vs 96... ) see below
        np.full(32, 0xF8, np.uint8),   # -> B -> B0 (word 2)
        np.full(32, 0xFF, np.uint8),   # -> B -> B1 (word 3)
    ])
    # Query 1 (0x1F = 5 bits): dist to A = 5*32, to B = 3*32 -> B; then
    # dist to B0 (0xF0) = bits(0xEF)*32 = 224, to B1 (0xFF) =
    # bits(0xE0)*32 = 96 -> B1 (word 3). Query 2 (0xF8 = 5 bits):
    # B wins (96 < 160); B0 (bits(0x08)=1) beats B1 (bits(0x07)=3).
    expect_words = [0, 3, 2, 3]
    desc = jnp.asarray(
        np.ascontiguousarray(queries8).view(np.uint32).reshape(-1, 8)
    )
    fb = transform(voc, desc, jnp.ones(4, bool))
    np.testing.assert_array_equal(np.asarray(fb.word), expect_words)
    np.testing.assert_allclose(
        np.asarray(fb.weight),
        np.asarray(voc.word_weight)[expect_words],
    )
    # node ids at node_level=1 (levels_up=1): the level-0 slot of the
    # chosen branch: A=0, B=1.
    np.testing.assert_array_equal(np.asarray(fb.node), [0, 1, 1, 1])


def test_dbow2_text_ragged_tree(tmp_path):
    """Ragged DBoW2 trees are legal (TemplatedVocabulary.h:1338-1424;
    the real ORBvoc is ragged): a leaf may terminate ABOVE depth L and
    a node may have fewer than k children. The loader must virtualize
    shallow leaves down to depth L so the fixed-depth descent lands on
    a unique word slot carrying the leaf's weight (round-4 bug: weight
    0 + no word = silent vocabulary corruption). Also runs
    tools/convert_orbvoc.py end-to-end on the ragged file."""
    import subprocess
    import sys

    import numpy as np
    from c_orb_slam_tpu.bow.vocab import load, load_dbow2_text, transform

    def dline(parent, is_leaf, byte, weight):
        d = " ".join([str(byte)] * 32)
        return f"{parent} {int(is_leaf)} {d} {weight}"

    # k=2, L=3. Node ids in file order (1-based):
    #  1=A(0x00), 2=B(0xFF) under root;
    #  3=A0(0x00) LEAF AT LEVEL 1 (shallow, w=0.6), 4=A1(0x0F) internal;
    #  5=A10(0x0C, w=0.3), 6=A11(0x0F, w=0.2) leaves at full depth;
    #  7=B0(0xF0) B's ONLY child (ragged), 8=B00(0xFF, w=0.9) B0's only
    #  child, a leaf at depth 3.
    lines = [
        "2 3 0 0",
        dline(0, 0, 0x00, 0.0),
        dline(0, 0, 0xFF, 0.0),
        dline(1, 1, 0x00, 0.6),
        dline(1, 0, 0x0F, 0.0),
        dline(4, 1, 0x0C, 0.3),
        dline(4, 1, 0x0F, 0.2),
        dline(2, 0, 0xF0, 0.0),
        dline(7, 1, 0xFF, 0.9),
    ]
    p = tmp_path / "ragged.txt"
    p.write_text("\n".join(lines) + "\n")

    voc = load_dbow2_text(str(p), levels_up=1)
    ww = np.asarray(voc.word_weight)
    # Shallow leaf A0 virtualized to word slot 0 with ITS weight.
    assert ww[0] == np.float32(0.6)
    assert ww[2] == np.float32(0.3) and ww[3] == np.float32(0.2)
    assert ww[4] == np.float32(0.9)  # B->B0->B00 single-child chain

    queries8 = np.stack([
        np.full(32, 0x00, np.uint8),  # -> A -> A0 (virtualized word 0)
        np.full(32, 0x0F, np.uint8),  # -> A -> A1 -> A11 (word 3)
        np.full(32, 0xFF, np.uint8),  # -> B -> B0 -> B00 (word 4)
    ])
    desc = jnp.asarray(
        np.ascontiguousarray(queries8).view(np.uint32).reshape(-1, 8)
    )
    fb = transform(voc, desc, jnp.ones(3, bool))
    np.testing.assert_array_equal(np.asarray(fb.word), [0, 3, 4])
    np.testing.assert_allclose(np.asarray(fb.weight), [0.6, 0.2, 0.9])

    # Converter end-to-end on the ragged file: text -> npz -> load must
    # reproduce the exact same transform.
    out = tmp_path / "ragged.npz"
    subprocess.run(
        [sys.executable, "tools/convert_orbvoc.py", str(p), str(out)],
        check=True, capture_output=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    voc2 = load(str(out))
    # levels_up differs (converter default 4) - transform words/weights
    # must still agree; clamp node_level comparison out.
    fb2 = transform(voc2, desc, jnp.ones(3, bool))
    np.testing.assert_array_equal(np.asarray(fb2.word), np.asarray(fb.word))
    np.testing.assert_allclose(
        np.asarray(fb2.weight), np.asarray(fb.weight)
    )
