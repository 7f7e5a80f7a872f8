"""Stage 1: cyclic-consensus detection over the input reads.

Reference behavior: find_ccs_reads / load_ccs_reads (find_ccs.py:21-120).
Output files keep the exact reference format so downstream stages and the
resume logic are interchangeable:
  tmp/{prefix}.ccs.fa : '>read_id\\tsegments\\tlen(ccs)' + consensus
  tmp/{prefix}.raw.fa : '>read_id' + raw read
"""

import os

from ciri_long_tpu.io.fastx import read_fastx
from ciri_long_tpu.ops.ccs import find_consensus
from ciri_long_tpu.utils.logger import ProgressBar


def find_ccs_reads(in_file, out_dir, prefix, threads=1, debugging=False):
    """Detect rolling-circle reads; returns (total_reads, ro_reads,
    ccs_seq) with ccs_seq[read_id] = [segments, ccs, raw]."""
    prog = ProgressBar()
    prog.update(0)

    total_reads = 0
    ro_reads = 0
    ccs_seq = {}

    ccs_path = '{}/tmp/{}.ccs.fa'.format(out_dir, prefix)
    raw_path = '{}/tmp/{}.raw.fa'.format(out_dir, prefix)
    os.makedirs(os.path.dirname(ccs_path), exist_ok=True)

    with open(ccs_path, 'w') as out, open(raw_path, 'w') as trimmed:
        for read_id, seq in read_fastx(in_file):
            total_reads += 1
            segments, ccs = find_consensus(seq)
            if segments is None or ccs is None:
                continue
            ro_reads += 1
            out.write('>{}\t{}\t{}\n{}\n'.format(read_id, segments, len(ccs), ccs))
            trimmed.write('>{}\n{}\n'.format(read_id, seq))
            ccs_seq[read_id] = [segments, ccs, seq]
            if total_reads % 500 == 0:
                prog.update(min(99, total_reads // 500))
    prog.update(100)

    return total_reads, ro_reads, ccs_seq


def load_ccs_reads(out_dir, prefix):
    """Reload a previous run's CCS calls (find_ccs.py:106-120)."""
    ccs_seq = {}
    with open('{}/tmp/{}.ccs.fa'.format(out_dir, prefix), 'r') as f:
        for line in f:
            content = line.rstrip().split()
            seq = f.readline().rstrip()
            ccs_seq[content[0].lstrip('>')] = [content[1], seq]

    with open('{}/tmp/{}.raw.fa'.format(out_dir, prefix), 'r') as f:
        for line in f:
            read_id = line.rstrip().split()[0].lstrip('>')
            seq = f.readline().rstrip()
            ccs_seq[read_id].append(seq)
    return ccs_seq
