"""Stage 1: cyclic-consensus detection over the input reads.

Reference behavior: find_ccs_reads / load_ccs_reads (find_ccs.py:21-120).
Output files keep the exact reference format so downstream stages and the
resume logic are interchangeable:
  tmp/{prefix}.ccs.fa : '>read_id\\tsegments\\tlen(ccs)' + consensus
  tmp/{prefix}.raw.fa : '>read_id' + raw read
"""

import multiprocessing
import os

from ciri_long_tpu.io.fastx import read_fastx
from ciri_long_tpu.ops.ccs import find_consensus
from ciri_long_tpu.utils.logger import ProgressBar

CHUNK_SIZE = 250  # reference job granularity (find_ccs.py:62)


def _ccs_chunk(chunk):
    """Worker: run find_consensus over one chunk of (id, seq) pairs.
    Pure host code (numpy + C++ extensions) -- no jax in workers."""
    return [(rid, find_consensus(seq)) for rid, seq in chunk]


def find_ccs_reads(in_file, out_dir, prefix, threads=1, debugging=False):
    """Detect rolling-circle reads; returns (total_reads, ro_reads,
    ccs_seq) with ccs_seq[read_id] = [segments, ccs, raw].

    threads > 1 fans the 250-read chunks over a fork pool, the direct
    analog of the reference's worker pool (find_ccs.py:11-26,62);
    results are consumed in submission order so output files stay
    byte-deterministic."""
    prog = ProgressBar()
    prog.update(0)

    total_reads = 0
    ro_reads = 0
    ccs_seq = {}
    raw = dict(read_fastx(in_file))

    ccs_path = '{}/tmp/{}.ccs.fa'.format(out_dir, prefix)
    raw_path = '{}/tmp/{}.raw.fa'.format(out_dir, prefix)
    os.makedirs(os.path.dirname(ccs_path), exist_ok=True)

    items = list(raw.items())
    chunks = [items[i:i + CHUNK_SIZE] for i in range(0, len(items), CHUNK_SIZE)]

    if threads > 1 and len(chunks) > 1:
        ctx = multiprocessing.get_context('fork')
        with ctx.Pool(threads) as pool:
            result_iter = pool.imap(_ccs_chunk, chunks)
            results = _drain(result_iter, prog, len(chunks))
    else:
        results = _drain((_ccs_chunk(c) for c in chunks), prog, len(chunks))

    with open(ccs_path, 'w') as out, open(raw_path, 'w') as trimmed:
        for chunk_res in results:
            for read_id, (segments, ccs) in chunk_res:
                total_reads += 1
                if segments is None or ccs is None:
                    continue
                ro_reads += 1
                out.write('>{}\t{}\t{}\n{}\n'.format(
                    read_id, segments, len(ccs), ccs))
                trimmed.write('>{}\n{}\n'.format(read_id, raw[read_id]))
                ccs_seq[read_id] = [segments, ccs, raw[read_id]]
    prog.update(100)

    return total_reads, ro_reads, ccs_seq


def _drain(result_iter, prog, n_chunks):
    """Collect chunk results in submission order, ticking the bar."""
    results = []
    for i, res in enumerate(result_iter):
        results.append(res)
        prog.update(min(99, int(100 * (i + 1) / max(1, n_chunks))))
    return results


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
