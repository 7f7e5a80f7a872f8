"""Native chaining DP parity vs the numpy fallback."""

import numpy as np
import pytest

from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.models.aligner import GenomeAligner


def test_native_chain_matches_python(rng):
    fx = pytest.importorskip("ciri_long_tpu._chaincore")
    genome = Genome.from_dict({"c": "ACGT" * 2000})
    al = GenomeAligner(genome)

    n = 400
    r = np.sort(rng.integers(0, 500_000, n)).astype(np.int64)
    q = np.sort(rng.integers(0, 20_000, n)).astype(np.int64)
    order = np.lexsort((q, r))
    r, q = r[order], q[order]
    ctg = (r // 250_000).astype(np.int64)

    fb, pb = fx.chain(np.ascontiguousarray(r), np.ascontiguousarray(q),
                      np.ascontiguousarray(ctg), al.k, 64,
                      al.cfg.max_gap_ref, 5000)
    f_native = np.frombuffer(fb, np.float64)
    pre_native = np.frombuffer(pb, np.int64)

    # run the numpy fallback by hiding the extension
    import ciri_long_tpu
    saved = ciri_long_tpu._chaincore
    import sys
    try:
        sys.modules['ciri_long_tpu._chaincore'] = None  # force ImportError
        del ciri_long_tpu._chaincore
        f_py, pre_py = al._chain_dp(r, q, ctg, al.cfg.max_gap_ref, 5000)
    finally:
        ciri_long_tpu._chaincore = saved
        sys.modules['ciri_long_tpu._chaincore'] = saved

    np.testing.assert_allclose(f_native, f_py, rtol=0, atol=1e-9)
    np.testing.assert_array_equal(pre_native, pre_py)


def test_native_sketch_matches_numpy(rng):
    """chaincore.sketch vs the numpy winnowing path: identical canonical
    codes, positions and strands (all ties kept, minimap2-style)."""
    import builtins

    from ciri_long_tpu.models import minimizer as mz

    orig = builtins.__import__

    def block(name, *a, **k):
        if name == 'ciri_long_tpu' and a and a[2] and '_chaincore' in (a[2] or ()):
            raise ImportError
        return orig(name, *a, **k)

    for _ in range(25):
        L = int(rng.integers(1, 2000))
        codes = rng.integers(0, 4, L).astype(np.int8)
        if rng.random() < .4:
            codes[rng.integers(0, L, max(1, L // 50))] = 4
        k = int(rng.integers(5, 16))
        w = int(rng.integers(1, 12))
        nat = mz.minimizers(codes, k, w)
        builtins.__import__ = block
        try:
            ref = mz.minimizers(codes, k, w)
        finally:
            builtins.__import__ = orig
        for a, b in zip(nat, ref):
            np.testing.assert_array_equal(a, b)


def test_native_sketch_degenerate():
    from ciri_long_tpu.models.minimizer import minimizers

    for codes in (np.zeros(0, np.int8), np.array([0, 1, 2], np.int8),
                  np.full(100, 4, np.int8)):
        out = minimizers(codes, 15, 5)
        assert all(len(x) == 0 for x in out)


def test_native_backtrack_parity(rng):
    """C++ backtrack (chaincore.cpp::py_backtrack) vs the numpy greedy:
    identical chain sets, order, paths and scores, incl. valid masks,
    ties in f (stable order) and the max_chains cutoff."""
    import builtins
    from ciri_long_tpu.ops import chain as chain_mod

    orig = builtins.__import__

    def block(name, *a, **k):
        if name == 'ciri_long_tpu' and a and a[2] and \
                '_chaincore' in (a[2] or ()):
            raise ImportError
        return orig(name, *a, **k)

    for _ in range(40):
        B = int(rng.integers(1, 4))
        N = int(rng.integers(1, 120))
        # small integer-valued scores make f-ties common
        f = rng.integers(0, 12, (B, N)).astype(np.float64)
        pre = rng.integers(-1, N, (B, N)).astype(np.int64)
        valid = rng.random((B, N)) < 0.9
        ms = float(rng.integers(0, 8))
        ma = int(rng.integers(1, 4))
        mc = int(rng.integers(1, 6))
        nat = chain_mod.backtrack_chains(f, pre, valid, ms, ma, mc)
        builtins.__import__ = block
        try:
            ref = chain_mod.backtrack_chains(f, pre, valid, ms, ma, mc)
        finally:
            builtins.__import__ = orig
        assert len(nat) == len(ref)
        for rn, rr in zip(nat, ref):
            assert len(rn) == len(rr)
            for (pn, sn), (pr, sr) in zip(rn, rr):
                np.testing.assert_array_equal(pn, pr)
                assert sn == sr


def test_native_lookup_parity(rng):
    """Bucketed C++ lookup == np.searchsorted left/right on the sorted
    minimizer table, across empty buckets, duplicates and extremes."""
    from ciri_long_tpu import _chaincore

    table = np.sort(rng.choice(
        np.array([0, 1, 5, 0xffff, 0x10000, 0x10001, 0xdeadbeef,
                  0xffffffff], np.uint32), 50))
    table = np.sort(np.concatenate(
        [table, rng.integers(0, 2**32, 5000).astype(np.uint32)]))
    buckets = np.searchsorted(
        table, (np.arange(65537, dtype=np.int64) << 16)).astype(np.int64)
    qs = np.concatenate([
        rng.integers(0, 2**32, 3000).astype(np.uint32),
        rng.choice(table, 500),
        np.array([0, 0xffffffff], np.uint32)])
    lob, hib = _chaincore.lookup(table, buckets,
                                 np.ascontiguousarray(qs, np.uint32))
    lo = np.frombuffer(lob, np.int64)
    hi = np.frombuffer(hib, np.int64)
    np.testing.assert_array_equal(lo, np.searchsorted(table, qs, 'left'))
    np.testing.assert_array_equal(hi, np.searchsorted(table, qs, 'right'))


def test_native_lookup_parity_adaptive_bits(rng):
    """The adaptive bucket table (bits > 16, round-3 genome-scale fix)
    must keep exact searchsorted equivalence through the native lookup."""
    from ciri_long_tpu import _chaincore

    for bits in (16, 18, 22):
        table = np.sort(rng.integers(0, 2**32, 4000).astype(np.uint32))
        buckets = np.searchsorted(
            table, (np.arange((1 << bits) + 1, dtype=np.int64)
                    << (32 - bits))).astype(np.int64)
        qs = np.concatenate([
            rng.integers(0, 2**32, 2000).astype(np.uint32),
            rng.choice(table, 300),
            np.array([0, 0xffffffff], np.uint32)])
        lob, hib = _chaincore.lookup(
            table, buckets, np.ascontiguousarray(qs, np.uint32), bits)
        np.testing.assert_array_equal(
            np.frombuffer(lob, np.int64),
            np.searchsorted(table, qs, 'left'))
        np.testing.assert_array_equal(
            np.frombuffer(hib, np.int64),
            np.searchsorted(table, qs, 'right'))


def test_bucket_bits_scale_with_table():
    """build() widens the bucket table as the minimizer count grows."""
    from ciri_long_tpu.models.minimizer import MinimizerIndex

    # the formula, not a full genome build: bits grows at n = 2^(bits+5)
    def bits_for(n):
        bits = 16
        while bits < 26 and (n >> (bits + 5)):
            bits += 1
        return bits

    assert bits_for(1 << 20) == 16          # 50 Mb-scale: unchanged
    assert bits_for(1 << 22) == 18          # ~16/bucket
    assert bits_for(330_000_000) == 24      # 1 Gb-scale: ~20/bucket
    assert bits_for(1 << 40) == 26          # capped
    assert MinimizerIndex._CACHE_VERSION == 2  # stale caches rebuild


def test_native_anchors_parity(rng):
    """C++ whole-read anchor assembly == the numpy lookup/gather/lexsort
    cascade, incl. occurrence capping, strand flips and sort order."""
    import builtins
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.models.aligner import GenomeAligner

    g = "".join(rng.choice(list("ACGT"), 30_000))
    # plant repeats so max_occ capping fires
    g = g + g[5000:5400] * 6
    genome = Genome.from_dict({'c1': g[:20_000], 'c2': g[20_000:]})
    aln = GenomeAligner(genome)

    orig = builtins.__import__

    def block(name, *a, **k):
        if name == 'ciri_long_tpu' and a and a[2] and \
                '_chaincore' in (a[2] or ()):
            raise ImportError
        return orig(name, *a, **k)

    from ciri_long_tpu.utils.seq import encode_seq
    for t in range(12):
        if t % 3 == 0:
            s = g[rng.integers(0, 10_000):][:rng.integers(100, 2000)]
        elif t % 3 == 1:
            s = "".join(rng.choice(list("ACGTN"), rng.integers(50, 800)))
        else:   # revcomp slice
            comp = {'A': 'T', 'C': 'G', 'G': 'C', 'T': 'A'}
            raw = g[rng.integers(0, 10_000):][:800]
            s = "".join(comp[c] for c in reversed(raw))
        codes = encode_seq(s)
        nat = aln._anchors(codes, len(codes))
        builtins.__import__ = block
        try:
            ref = aln._anchors(codes, len(codes))
        finally:
            builtins.__import__ = orig
        for st in (1, -1):
            np.testing.assert_array_equal(nat[st][0], ref[st][0])
            np.testing.assert_array_equal(nat[st][1], ref[st][1])


def test_threaded_sketch_parity(rng):
    """Chunked multi-thread sketch == single-thread sketch on a >2M-base
    sequence with N stretches (the genome-index build path); chunk-edge
    window minima must reconcile exactly."""
    from ciri_long_tpu import _chaincore

    codes = rng.integers(0, 4, 5_000_000).astype(np.uint8)
    codes[rng.integers(0, len(codes), 2000)] = 4
    buf = codes.tobytes()
    one = _chaincore.sketch(buf, 15, 5, 1)
    four = _chaincore.sketch(buf, 15, 5, 4)
    for a, b in zip(one, four):
        assert a == b


def test_native_sortperm_parity(rng):
    """Radix sort permutation == np.argsort(kind='stable') on u32 keys
    incl. heavy duplicates and extremes."""
    from ciri_long_tpu import _chaincore

    for n in (0, 1, 7, 100_000):
        keys = np.concatenate([
            rng.integers(0, 2**32, max(0, n - 10)).astype(np.uint32),
            rng.choice(np.array([0, 1, 0xffff, 0x10000, 0xffffffff],
                                np.uint32), min(n, 10))])[:n]
        got = np.frombuffer(
            _chaincore.sortperm(np.ascontiguousarray(keys, np.uint32)),
            np.int64)
        np.testing.assert_array_equal(got,
                                      np.argsort(keys, kind='stable'))


def test_native_build_table_parity(rng, monkeypatch):
    """The memory-bounded native index build (chaincore.cpp::
    py_build_table: two-pass exact-alloc sketch + in-stream contig
    boundary filter + stable triple radix) produces byte-identical
    code/pos/strand/bucket tables to the python build path, including
    multi-contig boundaries, N runs, repeat ties (stable order) and the
    multi-chunk threaded split."""
    from ciri_long_tpu import _chaincore
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.models.minimizer import MinimizerIndex

    assert getattr(_chaincore, 'build_table', None) is not None

    # > 2 chunk_min bases so the threaded two-pass split engages;
    # repeats for ties, N islands for invalid k-mers, 3 contigs for the
    # boundary filter
    core = "".join(rng.choice(list("ACGT"), 1_400_000))
    seq = core + core[:300_000] + "N" * 37 + core[200_000:900_000]
    genome = Genome.from_dict({
        'c1': seq[:1_000_000],
        'c2': seq[1_000_000:2_100_000],
        'c3': seq[2_100_000:],
    })

    native = MinimizerIndex.build(genome, k=15, w=5, threads=3)

    # degenerate: contigs shorter than k emit nothing and don't crash
    # (still on the native path)
    tiny = Genome.from_dict({'t': 'ACGTACGTACGT', 'u': 'AC'})
    idx = MinimizerIndex.build(tiny, k=15, w=5)
    assert len(idx.codes) == 0

    monkeypatch.delattr(_chaincore, 'build_table')
    fallback = MinimizerIndex.build(genome, k=15, w=5, threads=3)

    np.testing.assert_array_equal(native.codes, fallback.codes)
    np.testing.assert_array_equal(native.pos, fallback.pos)
    np.testing.assert_array_equal(native.strand, fallback.strand)
    np.testing.assert_array_equal(native.buckets, fallback.buckets)
    assert native.bucket_bits == fallback.bucket_bits
    assert native.pos.dtype == np.uint32
