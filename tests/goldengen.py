"""Golden-dataset generator shared by the snapshot test and the
regeneration entry point.

The dataset is fully deterministic: a seeded 60 kb genome with two planted
circRNAs (single-exon '+', two-exon '-'), 8 rolling-circle reads and 2
linear reads.  Run ``python -m tests.goldengen`` from the repo root to
regenerate tests/golden/ after an INTENTIONAL behavior change (review the
diff before committing).
"""

import os
import shutil
from types import SimpleNamespace

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
OUTPUTS = ["g.cand_circ.fa", "g.low_confidence.fa", "g.info", "g.expression",
           "g.reads", "g.isoforms"]


def build_dataset(root):
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.tools.simulate import (plant_splice_signals,
                                              simulate_reads)

    rng = np.random.default_rng(424242)
    chars = list("".join(rng.choice(list("ACGT"), size=60_000)))
    loci = [("chr1", [(12_000, 12_450)], '+'),
            ("chr1", [(30_000, 30_260), (31_100, 31_400)], '-')]
    chr1 = "".join(plant_splice_signals(chars, loci))
    genome = Genome.from_dict({"chr1": chr1})

    ref = os.path.join(root, "g.fa")
    with open(ref, "w") as f:
        f.write(">chr1\n{}\n".format(chr1))
    reads = os.path.join(root, "r.fa")
    with open(reads, "w") as f:
        for rid, seq, cid in simulate_reads(genome, loci, rng, depth=4,
                                            min_copies=3.0, max_copies=5.0,
                                            sub=0.015, ins=0.008, dele=0.008):
            f.write(">{}\n{}\n".format(rid, seq))
        for i in range(2):
            st = 45_000 + i * 3_000
            f.write(">lin{}\n{}\n".format(i, chr1[st:st + 1_000]))
    return ref, reads


def run_pipeline(root):
    from ciri_long_tpu.cli.main import call, collapse

    ref, reads = build_dataset(root)
    out = os.path.join(root, "out")
    call(SimpleNamespace(input=reads, output=out, reference=ref, prefix="g",
                         gtf=None, circ=None, threads=1, debug=False))
    lst = os.path.join(root, "s.lst")
    with open(lst, "w") as f:
        f.write("S\t{}\n".format(os.path.join(out, "g.cand_circ.fa")))
    collapse(SimpleNamespace(input=lst, output=out, reference=ref, prefix="g",
                             gtf=None, circ=None, threads=1, debug=False))
    return out


def main():
    import tempfile
    with tempfile.TemporaryDirectory() as root:
        out = run_pipeline(root)
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name in OUTPUTS:
            shutil.copy(os.path.join(out, name), os.path.join(GOLDEN_DIR, name))
    print("golden outputs regenerated under", GOLDEN_DIR)


if __name__ == "__main__":
    main()
