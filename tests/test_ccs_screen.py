"""Device CCS pre-screen (ops/period.py::tandem_counts + screen_periodic,
wired into pipeline/find_ccs.py): the screen must be SOUND -- it may pass
non-periodic reads (the host path rejects them) but must never drop a read
the host lag voting would elect, so screened and unscreened runs are
byte-identical (VERDICT round-1 item 6)."""

import numpy as np
import pytest

from ciri_long_tpu.ops.ccs import find_consensus
from ciri_long_tpu.ops.period import screen_periodic, tandem_counts
from ciri_long_tpu.utils.seq import encode_seq
from tests.test_poa import mutate
from tests.test_pipeline_call import make_rolling_read


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def _naive_tandem_counts(codes, max_lag, k=11):
    L = len(codes)
    out = np.zeros(max_lag, np.int32)
    for d in range(1, max_lag + 1):
        for i in range(L):
            j = i + d
            if j + k > L:
                break
            a, b = codes[i:i + k], codes[j:j + k]
            if (a < 4).all() and (b < 4).all() and (a == b).all():
                out[d - 1] += 1
    return out


def test_tandem_counts_oracle(rng):
    """Device counts vs a naive host oracle, including N bases and PAD."""
    for _ in range(6):
        L = int(rng.integers(40, 180))
        codes = rng.integers(0, 4, L).astype(np.int8)
        # tandem structure so nonzero counts appear
        p = int(rng.integers(12, min(40, L // 2)))
        codes[p:2 * p] = codes[:p]
        codes[rng.integers(0, L, 3)] = 4      # N poisoning
        max_lag = int(rng.integers(8, 64))
        pad = int(rng.integers(0, 32))
        mat = np.full((1, L + pad), 5, np.int8)
        mat[0, :L] = codes
        dev = np.asarray(tandem_counts(mat, max_lag))[0]
        ref = _naive_tandem_counts(codes, max_lag)
        assert (dev == ref).all(), (L, max_lag)


def test_tandem_counts_lag_offset(rng):
    """Sharding contract: lag slices with lag_offset concatenate to the
    full profile (the 'lag' mesh axis, parallel/mesh.py)."""
    L, max_lag = 256, 64
    codes = rng.integers(0, 4, (2, L)).astype(np.int8)
    codes[:, 37:74] = codes[:, :37]
    full = np.asarray(tandem_counts(codes, max_lag))
    parts = [np.asarray(tandem_counts(codes, max_lag // 4,
                                      lag_offset=i * (max_lag // 4),
                                      pad_lags=max_lag))
             for i in range(4)]
    assert (np.concatenate(parts, axis=1) == full).all()


@pytest.mark.parametrize("noise", [0.02, 0.08])
def test_screen_soundness_fuzz(rng, noise):
    """Any read the host path calls periodic MUST pass the screen; most
    purely linear/random reads must fail it (efficacy)."""
    reads = []
    for i in range(30):
        unit = rand_seq(rng, int(rng.integers(60, 450)))
        reads.append(('circ%d' % i,
                      make_rolling_read(rng, unit,
                                        copies=2.2 + 3 * rng.random(),
                                        noise=noise)))
    for i in range(30):
        reads.append(('lin%d' % i, rand_seq(rng, int(rng.integers(150, 2000)))))

    n_skipped_nonperiodic = 0
    for rid, seq in reads:
        codes = encode_seq(seq)
        L = len(codes)
        if L < 60:
            continue
        max_lag = max(16, -(-L // 2))
        counts = np.asarray(tandem_counts(codes[None, :], max_lag))
        keep = screen_periodic(counts, [L])[0]
        segments, ccs = find_consensus(seq)
        if segments is not None:
            assert keep, 'screen dropped a host-periodic read {}'.format(rid)
        elif not keep:
            n_skipped_nonperiodic += 1
    # efficacy: the screen must actually skip a decent share of the
    # non-periodic reads (all 30 linear reads are non-periodic)
    assert n_skipped_nonperiodic >= 20


def test_pipeline_screen_equivalence(rng, tmp_path):
    """find_ccs_reads with the screen forced on vs off: identical files."""
    from ciri_long_tpu.pipeline.find_ccs import find_ccs_reads

    reads_fa = tmp_path / 'reads.fa'
    with open(reads_fa, 'w') as f:
        for i in range(12):
            unit = rand_seq(rng, int(rng.integers(80, 400)))
            f.write('>c{}\n{}\n'.format(i, make_rolling_read(
                rng, unit, copies=2.5 + 0.3 * i, noise=0.03)))
        for i in range(8):
            f.write('>l{}\n{}\n'.format(i, rand_seq(rng, 900)))

    out_a = tmp_path / 'a'
    out_b = tmp_path / 'b'
    ra = find_ccs_reads(str(reads_fa), str(out_a), 'p',
                        use_device_screen=False)
    rb = find_ccs_reads(str(reads_fa), str(out_b), 'p',
                        use_device_screen=True)
    assert ra[0] == rb[0] and ra[1] == rb[1]
    assert ra[2] == rb[2]
    for fn in ('tmp/p.ccs.fa', 'tmp/p.raw.fa'):
        assert (out_a / fn).read_bytes() == (out_b / fn).read_bytes()


def test_ccs_chunk_batched_matches_host(rng, tmp_path):
    """The device-batched CCS chunk path (_ccs_chunk_batched: one NW
    program per chunk) must produce byte-identical consensus results to
    the host path for every read."""
    from ciri_long_tpu.pipeline.find_ccs import _ccs_chunk, _ccs_chunk_batched
    from tests.test_poa import mutate

    reads = []
    for i in range(30):
        unit = "".join(rng.choice(list("ACGT"), size=int(rng.integers(60, 500))))
        copies = float(rng.uniform(2.2, 6.0))
        full = (unit * int(np.ceil(copies)))[:int(len(unit) * copies)]
        reads.append(('r{}'.format(i), mutate(rng, full, sub=0.03)))
    for i in range(8):          # non-periodic
        reads.append(('lin{}'.format(i),
                      "".join(rng.choice(list("ACGT"), size=800))))

    host = _ccs_chunk(reads)
    dev = _ccs_chunk_batched(reads)
    assert len(host) == len(dev)
    for (hid, (hseg, hcons)), (did, (dseg, dcons)) in zip(host, dev):
        assert hid == did
        assert hseg == dseg
        assert hcons == dcons


def test_ccs_device_all_matches_chunked(rng, monkeypatch):
    """_ccs_device_all (megabatched submit-all/collect-all overlap, pooled
    detection) must be an exact reordering-free equivalent of mapping
    _ccs_chunk_batched over the same reads -- at 1 thread and with the
    detection pool engaged."""
    from ciri_long_tpu.pipeline import find_ccs as fc
    from tests.test_poa import mutate

    reads = []
    for i in range(24):
        unit = "".join(rng.choice(list("ACGT"), size=int(rng.integers(60, 300))))
        copies = float(rng.uniform(2.2, 5.0))
        full = (unit * int(np.ceil(copies)))[:int(len(unit) * copies)]
        reads.append(('r{}'.format(i), mutate(rng, full, sub=0.03)))
    for i in range(6):
        reads.append(('lin{}'.format(i),
                      "".join(rng.choice(list("ACGT"), size=700))))

    class _Prog:
        def update(self, *_):
            pass

    flat_ref = [r for r in fc._ccs_chunk_batched(reads)]
    # force several megabatches so the submit-all/collect-all overlap and
    # the megabatch partition itself are both exercised
    monkeypatch.setattr(fc, 'MEGA_CHUNK', 7)
    flat_t1 = [r for c in fc._ccs_device_all(reads, 1, _Prog()) for r in c]
    assert flat_ref == flat_t1
    monkeypatch.setattr(fc, 'CHUNK_SIZE', 5)
    flat_pool = [r for c in fc._ccs_device_all(reads, 2, _Prog()) for r in c]
    assert flat_ref == flat_pool


def test_screen_keep_fused_superset(rng):
    """The fused device screen (screen_keep: counts + election in one
    program, integer support bar) must keep a SUPERSET of what the
    two-step host election keeps -- its bar is infinitesimally more
    permissive at float-representation boundaries, never stricter."""
    from ciri_long_tpu.ops.period import screen_keep

    reads = []
    for i in range(20):
        unit = rand_seq(rng, int(rng.integers(60, 350)))
        reads.append(make_rolling_read(rng, unit, copies=2.5, noise=0.05))
    for i in range(20):
        reads.append(rand_seq(rng, int(rng.integers(150, 1000))))

    b = 2048
    max_lag = b // 2
    mat = np.full((len(reads), b), 5, np.int8)
    lens = np.zeros(len(reads), np.int32)
    for t, seq in enumerate(reads):
        codes = encode_seq(seq)
        mat[t, :len(codes)] = codes
        lens[t] = len(codes)
    fused = np.asarray(screen_keep(mat, lens, max_lag))
    counts = np.asarray(tandem_counts(mat, max_lag))
    twostep = screen_periodic(counts, lens.tolist())
    assert (fused | ~twostep).all()          # fused >= twostep
    assert fused.sum() <= twostep.sum() + 2  # and not trivially keep-all


def test_pipeline_ccs_hybrid_equivalence(rng, tmp_path, monkeypatch):
    """find_ccs_reads with the hybrid steal forced on (pool front +
    batched-device-NW back, round 5) must write byte-identical files to
    the plain pooled path."""
    from ciri_long_tpu.pipeline.find_ccs import find_ccs_reads

    reads_fa = tmp_path / 'reads.fa'
    with open(reads_fa, 'w') as f:
        for i in range(24):
            unit = rand_seq(rng, int(rng.integers(80, 400)))
            f.write('>c{}\n{}\n'.format(i, make_rolling_read(
                rng, unit, copies=2.5 + 0.2 * i, noise=0.03)))
        for i in range(8):
            f.write('>l{}\n{}\n'.format(i, rand_seq(rng, 900)))

    monkeypatch.setenv('CIRI_CCS_HYBRID', '0')
    out_a = tmp_path / 'a'
    ra = find_ccs_reads(str(reads_fa), str(out_a), 'p', threads=2,
                        use_device_screen=False)
    monkeypatch.setenv('CIRI_CCS_HYBRID', '1')
    # small chunks so both sides demonstrably process some
    import ciri_long_tpu.pipeline.find_ccs as fc
    monkeypatch.setattr(fc, 'CHUNK_SIZE', 4)
    out_b = tmp_path / 'b'
    rb = find_ccs_reads(str(reads_fa), str(out_b), 'p', threads=2,
                        use_device_screen=False)
    assert ra[0] == rb[0] and ra[1] == rb[1] and ra[2] == rb[2]
    for fn in ('tmp/p.ccs.fa', 'tmp/p.raw.fa'):
        assert (out_a / fn).read_bytes() == (out_b / fn).read_bytes()
