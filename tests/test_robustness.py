"""Robustness and output-format contracts: gzipped input through the CLI,
N-containing reads, empty inputs, and the exact record layouts downstream
tools parse (find_bsj.py:363-366, collapse.py:54-58)."""

import gzip
import re
from types import SimpleNamespace

import numpy as np
import pytest

from tests.test_pipeline_call import make_rolling_read


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def test_gzip_fastq_call(rng, tmp_path):
    from ciri_long_tpu.cli.main import call

    chr1 = list(rand_seq(rng, 20_000))
    st, en = 9_000, 9_400
    chr1[st - 2:st] = list("AG")
    chr1[en:en + 2] = list("GT")
    chr1 = "".join(chr1)
    unit = chr1[st:en]
    ref = tmp_path / "g.fa"
    ref.write_text(">chr1\n{}\n".format(chr1))

    reads = tmp_path / "reads.fq.gz"
    with gzip.open(reads, "wt") as f:
        for i in range(4):
            seq = make_rolling_read(rng, unit, copies=4.0, rot=i * 37,
                                    noise=0.01)
            f.write("@r{} desc\n{}\n+\n{}\n".format(i, seq, "I" * len(seq)))
    out = tmp_path / "out"
    counts = call(SimpleNamespace(input=str(reads), output=str(out),
                                  reference=str(ref), prefix="gz", gtf=None,
                                  circ=None, threads=1, debug=False))
    assert counts['bsj'] >= 3

    # record format contract
    header_re = re.compile(
        r'^>\S+\t\S+:\d+-\d+\t(\+|-|NA)\t\S+\t\S+\t\d+\|\d+-\d+\t[\d;-]+$')
    with open(out / "gz.cand_circ.fa") as f:
        for line in f:
            assert header_re.match(line.rstrip()), line
            seq = f.readline().rstrip()
            assert set(seq) <= set("ACGTN")


def test_reads_with_n_bases(rng, tmp_path):
    from ciri_long_tpu.ops.ccs import find_consensus

    unit = rand_seq(rng, 300)
    read = list(unit * 4)
    for p in range(50, len(read), 97):
        read[p] = 'N'
    read = "".join(read)
    seg, ccs = find_consensus(read)
    # sparse Ns must not break period detection
    assert seg is not None
    assert abs(len(ccs) - 300) <= 10


def test_empty_input_call_collapse(tmp_path):
    from ciri_long_tpu.cli.main import call, collapse

    ref = tmp_path / "g.fa"
    ref.write_text(">chr1\n{}\n".format("ACGT" * 2500))
    reads = tmp_path / "reads.fa"
    reads.write_text("")
    out = tmp_path / "out"
    counts = call(SimpleNamespace(input=str(reads), output=str(out),
                                  reference=str(ref), prefix="empty",
                                  gtf=None, circ=None, threads=1, debug=False))
    assert counts['bsj'] == 0
    assert (out / "empty.cand_circ.fa").read_text() == ""

    lst = tmp_path / "s.lst"
    lst.write_text("S\t{}\n".format(out / "empty.cand_circ.fa"))
    (out / "empty.low_confidence.fa").write_text("")
    circ_cnt, iso_cnt = collapse(
        SimpleNamespace(input=str(lst), output=str(out), reference=str(ref),
                        prefix="empty", gtf=None, circ=None, threads=1,
                        debug=False))
    assert circ_cnt == 0 and iso_cnt == 0


def test_version_and_help():
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, "-m", "ciri_long_tpu.cli.main", "--version"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0
    assert "0.1.0" in out.stdout + out.stderr


def test_scan_chunk_resume(rng, tmp_path, monkeypatch):
    """Batch-granular resume: killing the scan after one chunk and rerunning
    must reuse the finished chunk and produce identical output."""
    from ciri_long_tpu.config import CallConfig
    from ciri_long_tpu.context import Context
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.models.aligner import GenomeAligner
    from ciri_long_tpu.ops.ccs import find_consensus
    from ciri_long_tpu.pipeline import find_bsj as fb
    from tests.test_pipeline_call import make_rolling_read
    import dataclasses

    chr1 = list(rand_seq(rng, 25_000))
    st, en = 9_000, 9_400
    chr1[st - 2:st] = list("AG")
    chr1[en:en + 2] = list("GT")
    chr1 = "".join(chr1)
    unit = chr1[st:en]
    genome = Genome.from_dict({"chr1": chr1})
    ctx = Context(aligner=GenomeAligner(genome), genome=genome)

    ccs_seq = {}
    for i in range(6):
        seq = make_rolling_read(rng, unit, copies=4.0, rot=i * 31, noise=0.01)
        seg, ccs = find_consensus(seq)
        assert ccs is not None
        ccs_seq["r%d" % i] = [seg, ccs, seq]

    cfg = dataclasses.replace(CallConfig(), ccs_chunk_size=2)
    out_dir = str(tmp_path)
    (tmp_path / "tmp").mkdir()

    # full run for the golden output
    cnt_full, short_full = fb.scan_ccs_reads(ctx, ccs_seq, True, out_dir,
                                             "full", cfg)
    golden = (tmp_path / "full.cand_circ.fa").read_text()

    # interrupted run: raise after the first chunk
    calls = {"n": 0}
    orig = fb.scan_ccs_chunk

    def bomb(ctx_, chunk, canon, cfg_):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt
        return orig(ctx_, chunk, canon, cfg_)

    monkeypatch.setattr(fb, "scan_ccs_chunk", bomb)
    with pytest.raises(KeyboardInterrupt):
        fb.scan_ccs_reads(ctx, ccs_seq, True, out_dir, "part", cfg)
    monkeypatch.setattr(fb, "scan_ccs_chunk", orig)

    # resumed run must skip chunk 0 and match the golden output
    cnt_resume, short_resume = fb.scan_ccs_reads(ctx, ccs_seq, True, out_dir,
                                                 "part", cfg)
    assert (tmp_path / "part.cand_circ.fa").read_text() == golden
    assert dict(cnt_resume) == dict(cnt_full)


def test_ssw_cli(tmp_path, capsys, monkeypatch):
    from ciri_long_tpu.tools import ssw_cli
    t = tmp_path / "t.fa"
    q = tmp_path / "q.fa"
    t.write_text(">seq1\nACGTACGTTGCA\n")
    q.write_text(">q1\nCGTACGT\n")
    monkeypatch.setattr("sys.argv", ["ssw", str(t), str(q), "--cigar"])
    ssw_cli.main()
    out = capsys.readouterr().out.strip().split("\n")
    assert out[0].startswith("query\ttarget")
    fields = out[1].split("\t")
    assert fields[0] == "q1" and fields[1] == "seq1"
    assert int(fields[2]) == 14           # 7 exact matches * 2
    assert fields[7] == "7M"


def test_genomic_tandem_repeat_not_called(rng, tmp_path):
    """A linear read over a genomic satellite looks like a rolling circle to
    the CCS detector; the linear-mapping filter (find_bsj.py:243-246) must
    reject it."""
    from ciri_long_tpu.cli.main import call

    unit = rand_seq(rng, 300)
    chr1 = rand_seq(rng, 9_000) + unit * 6 + rand_seq(rng, 9_000)
    ref = tmp_path / "g.fa"
    ref.write_text(">chr1\n{}\n".format(chr1))

    reads = tmp_path / "reads.fa"
    with open(reads, "w") as f:
        # linear reads spanning the satellite plus flanks
        for i in range(3):
            st = 8_800 - i * 50
            f.write(">sat{}\n{}\n".format(i, chr1[st:st + 2_300]))
    out = tmp_path / "out"
    counts = call(SimpleNamespace(input=str(reads), output=str(out),
                                  reference=str(ref), prefix="sat", gtf=None,
                                  circ=None, threads=1, debug=False))
    # the CCS stage may flag them, but no BSJ call may survive
    assert counts['bsj'] == 0
    assert (out / "sat.cand_circ.fa").read_text() == ""
