"""Convert the reference's pretrained ORBvoc.txt to the dense npz layout.

The reference loads the ~140 MB DBoW2 text vocabulary at every start
(System.cc:64, seconds of parse time); this converts it ONCE into the
framework's dense level-major arrays (bow/vocab.py), after which loads
are a single npz read.

Usage:
    python tools/convert_orbvoc.py /path/to/ORBvoc.txt [out.npz]

Then point the config at it:
    SlamConfig(vocabulary=VocabularyConfig(path="ORBvoc.npz"))
or place it as the default artifact.

Format spec: TemplatedVocabulary::loadFromTextFile
(reference: Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1338-1424);
the parser is bow/vocab.load_dbow2_text, round-trip-tested against a
hand-computed descent in tests/test_bow.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    src = sys.argv[1]
    dst = sys.argv[2] if len(sys.argv) > 2 else (
        os.path.splitext(src)[0] + ".npz"
    )
    from c_orb_slam_tpu.bow import vocab

    print(f"parsing {src} (the full ORBvoc takes a few minutes)...")
    voc = vocab.load_dbow2_text(src)
    print(f"k={voc.k} L={voc.L} words={voc.n_words}")
    vocab.save(voc, dst)
    print(f"written {dst}")


if __name__ == "__main__":
    main()
