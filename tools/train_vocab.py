"""Train and ship the default BoW vocabulary artifact.

The reference loads the pretrained ~140MB ORBvoc.txt (k=10, L=6, ~1M
words; /root/reference/src/System.cc:64, Thirdparty/DBoW2). That file is
absent from the snapshot (SURVEY.md §0), so the framework ships its own
vocabulary trained on a large synthetic corpus rendered with the same
generators the tests use. k=10, L=5 (100k words) keeps the artifact a few
MB while giving place recognition four orders of magnitude more words than
the round-1 online-trained k=10, L=4-from-4-keyframes stopgap.

Usage: python tools/train_vocab.py [n_worlds] [out.npz]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from c_orb_slam_tpu.bow import vocab as vocab_mod
    from c_orb_slam_tpu.config import OrbConfig
    from c_orb_slam_tpu.ops import extract
    from synthetic import blob_world, render_scene, smooth_trajectory

    n_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "c_orb_slam_tpu", "assets", "vocab_k10_L5.npz",
        )
    )
    orb = OrbConfig(n_features=2000, n_levels=8)
    K4 = (500.0, 500.0, 320.0, 240.0)
    frames_per_world = 12

    t0 = time.time()
    import jax

    extract_jit = jax.jit(lambda im: extract.extract_orb(im, orb, seed=42))
    descs = []
    for w in range(n_worlds):
        xw, inten, size = blob_world(300 + 40 * (w % 7), seed=1000 + w)
        traj = smooth_trajectory(frames_per_world, seed=w)
        pending = []
        for i in range(frames_per_world):
            img = render_scene(xw, inten, size, traj[i], K4)
            kps = extract_jit(jnp.asarray(img))
            pending.append((kps.desc, kps.valid))
        for d, v in jax.device_get(pending):
            descs.append(d[v])
        print(f"world {w+1}/{n_worlds} ({time.time()-t0:.1f}s)", flush=True)
    total = sum(len(d) for d in descs)
    print(f"extracted {total} descriptors from {len(descs)} images "
          f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    voc = vocab_mod.train_vocabulary(descs, k=10, L=5, levels_up=3, seed=42)
    print(f"trained k=10 L=5 in {time.time()-t0:.1f}s")

    os.makedirs(os.path.dirname(out), exist_ok=True)
    vocab_mod.save(voc, out)
    print(f"saved {out} ({os.path.getsize(out)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
