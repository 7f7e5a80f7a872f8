"""Adversarial loci e2e (VERDICT r1 item 10): deterministic datasets that
stress the known-hard paths -- a sub-150 bp circle that must ride the
short-CCS recovery pass (reference find_bsj.py:451-490), an N-rich
junction neighbourhood, and a minus-strand multi-exon locus."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.tools.simulate import (circ_sequence,
                                          plant_splice_signals,
                                          simulate_reads)


@pytest.fixture(scope="module")
def adversarial_world(module_rng, tmp_path_factory):
    rng = module_rng
    root = tmp_path_factory.mktemp("adv")
    chars = list("".join(rng.choice(list("ACGT"), size=150_000)))

    # locus A: sub-150 bp single-exon circle -> CCS < 150 bp, minimap2
    # analog leaves it unmapped and the BWA-analog recovery pass must call
    # it (reference find_bsj.py:260-261,451-462)
    loci = [('chr1', [(20_000, 20_110)], '+'),
            # locus B: 400 bp circle with N runs near the junction
            ('chr1', [(50_000, 50_400)], '+'),
            # locus C: minus-strand three-exon circle
            ('chr1', [(100_000, 100_180), (100_420, 100_600),
                      (100_900, 101_060)], '-')]
    chars = plant_splice_signals(chars, loci)

    # N-rich neighbourhood for locus B: a run 60 bp upstream of the BSJ
    # start and another inside the unit body -- the clip-SW window, the
    # free-sliding homology search and the consensus all see Ns
    chars[49_910:49_940] = list("N" * 30)
    chars[50_190:50_200] = list("N" * 10)

    chr1 = "".join(chars)
    genome = Genome.from_dict({'chr1': chr1})

    ref = root / "genome.fa"
    with open(ref, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(chr1), 80):
            f.write(chr1[i:i + 80] + "\n")

    reads = root / "reads.fa"
    n_per = {}
    with open(reads, "w") as f:
        for rid, seq, cid in simulate_reads(genome, loci, rng, depth=8,
                                            min_copies=2.5, max_copies=6.0,
                                            sub=0.02, ins=0.01, dele=0.01):
            f.write(">{}\n{}\n".format(rid, seq))
            n_per[cid] = n_per.get(cid, 0) + 1
    truth = []
    for ctg, exons, strand in loci:
        truth.append((ctg, exons[0][0] + 1, exons[-1][1], strand))
    return root, ref, reads, truth, n_per


def test_adversarial_call_collapse(adversarial_world):
    from ciri_long_tpu.cli.main import call, collapse

    root, ref, reads, truth, n_per = adversarial_world
    out_dir = root / "out"
    args = SimpleNamespace(input=str(reads), output=str(out_dir),
                           reference=str(ref), prefix="adv", gtf=None,
                           circ=None, threads=1, debug=False)
    counts = call(args)
    assert counts['consensus'] >= 20          # 3 loci x 8 reads, few drops

    # every locus must be called: count cand_circ records per truth BSJ
    per_locus = {t: 0 for t in truth}
    recovered_small = 0
    with open(out_dir / "adv.cand_circ.fa") as f:
        for line in f:
            header = line.rstrip().lstrip('>').split('\t')
            seq = f.readline().rstrip()
            ctg, span = header[1].split(':')
            st, en = map(int, span.split('-'))
            for t in truth:
                if ctg == t[0] and abs(st - t[1]) <= 20 and \
                        abs(en - t[2]) <= 20:
                    per_locus[t] += 1
                    if t[2] - t[1] < 150:
                        recovered_small += 1
    for t, n in per_locus.items():
        assert n >= max(2, n_per.get('{}:{}-{}'.format(*t[:3]), 8) // 2), \
            (t, per_locus)
    # the sub-150 bp circle can only arrive via the recovery pass
    assert recovered_small >= 2

    lst = root / "samples.lst"
    lst.write_text("ADV\t{}\n".format(out_dir / "adv.cand_circ.fa"))
    cargs = SimpleNamespace(input=str(lst), output=str(out_dir),
                            reference=str(ref), prefix="adv", gtf=None,
                            circ=None, threads=1, debug=False)
    circ_cnt, iso_cnt = collapse(cargs)
    assert circ_cnt == 3

    called = []
    with open(out_dir / "adv.info") as f:
        for line in f:
            fields = line.rstrip().split('\t')
            called.append((fields[0], int(fields[3]), int(fields[4]),
                           fields[6], fields[8]))
    for ctg, st, en, strand in truth:
        hits = [c for c in called
                if c[0] == ctg and abs(c[1] - st) <= 5 and abs(c[2] - en) <= 5]
        assert hits, (('missing', ctg, st, en), called)
    # the minus-strand multi-exon locus must carry a multi-exon isoform
    minus = [c for c in called if abs(c[1] - truth[2][1]) <= 5]
    assert minus and ',' in minus[0][4].split('isoform "')[1]
