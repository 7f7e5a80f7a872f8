"""RTT-aware device-offload defaults (VERDICT r2 #1/#7): the measured
dispatch round-trip gates which stages auto-offload, and persists so the
NEXT process (e.g. collapse after call) can pick its backend before any
device initialises."""

import json
import os
import time
from types import SimpleNamespace

import numpy as np


def test_cached_rtt_roundtrip(tmp_path, monkeypatch):
    from ciri_long_tpu.utils import dispatch

    monkeypatch.setattr(dispatch, '_rtt_cache_path',
                        lambda: str(tmp_path / 'rtt.json'))
    monkeypatch.delenv('CIRI_DEVICE_RTT_MS', raising=False)
    assert dispatch.cached_rtt_ms() is None
    link = dispatch._link_identity()
    with open(tmp_path / 'rtt.json', 'w') as f:
        json.dump({'rtt_ms': 37.2, 'ts': time.time(), 'link': link}, f)
    assert dispatch.cached_rtt_ms() == 37.2
    # records measured over a DIFFERENT link are ignored (ADVICE r3: a
    # tunnel swapped for a local chip must trigger a live re-probe)
    with open(tmp_path / 'rtt.json', 'w') as f:
        json.dump({'rtt_ms': 37.2, 'ts': time.time(),
                   'link': link + '|other'}, f)
    assert dispatch.cached_rtt_ms() is None
    # legacy records without a link key are ignored too
    with open(tmp_path / 'rtt.json', 'w') as f:
        json.dump({'rtt_ms': 37.2, 'ts': time.time()}, f)
    assert dispatch.cached_rtt_ms() is None
    # stale entries are ignored
    with open(tmp_path / 'rtt.json', 'w') as f:
        json.dump({'rtt_ms': 37.2, 'ts': time.time() - 1e6, 'link': link}, f)
    assert dispatch.cached_rtt_ms() is None
    # env pin wins without a file
    monkeypatch.setenv('CIRI_DEVICE_RTT_MS', '3.5')
    assert dispatch.cached_rtt_ms() == 3.5
    assert dispatch.device_rtt_ms() == 3.5


def test_collapse_prefers_host_on_high_rtt(monkeypatch):
    """With a persisted high RTT and no --backend, _apply_backend flips
    the collapse process to the CPU backend."""
    import jax

    from ciri_long_tpu.cli.main import _apply_backend

    monkeypatch.setenv('CIRI_DEVICE_RTT_MS', '45')
    args = SimpleNamespace(backend=None, prefer_host_on_high_rtt=True)
    _apply_backend(args)
    assert jax.config.jax_platforms == 'cpu'


def test_ensure_compile_cache_dirs(tmp_path, monkeypatch):
    """Cache dirs are per-backend (mixing backends in one dir corrupts
    jax's deserializer); JAX_COMPILATION_CACHE_DIR wins outright."""
    import jax

    from ciri_long_tpu.utils import dispatch

    monkeypatch.delenv('JAX_COMPILATION_CACHE_DIR', raising=False)
    got = dispatch.ensure_compile_cache(base_dir=str(tmp_path))
    # per-backend prefix + machine-config fingerprint (ADVICE r3: CPU
    # processes with different XLA_FLAGS must not share a dir)
    assert got.startswith(
        str(tmp_path / ('jax_cache_' + jax.default_backend())))
    assert os.path.isdir(got)
    flags = os.environ.get('XLA_FLAGS', '')
    monkeypatch.setenv(
        'XLA_FLAGS', flags + ' --xla_force_host_platform_device_count=8')
    other = dispatch.ensure_compile_cache(base_dir=str(tmp_path))
    assert other != got
    monkeypatch.setenv('XLA_FLAGS', flags) if flags else \
        monkeypatch.delenv('XLA_FLAGS', raising=False)
    monkeypatch.setenv('JAX_COMPILATION_CACHE_DIR', str(tmp_path / 'pin'))
    assert dispatch.ensure_compile_cache() == str(tmp_path / 'pin')


def test_ccs_device_gates_respect_rtt(monkeypatch):
    """find_ccs auto rules keep the screen and the NW offload OFF on a
    high-RTT link and ON on a local-grade one (backend permitting)."""
    from ciri_long_tpu.utils import dispatch

    monkeypatch.setenv('CIRI_DEVICE_RTT_MS', '45')
    assert dispatch.device_rtt_ms() >= 5.0
    monkeypatch.setenv('CIRI_DEVICE_RTT_MS', '0.8')
    assert dispatch.device_rtt_ms() < 5.0


def test_chain_route_model(monkeypatch):
    """The calibrated chain-route model (models/aligner.py) sends scan
    chaining to the host core on high-RTT links and to the device on
    local-grade links; CIRI_CHAIN_ROUTE pins it."""
    import numpy as np
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.models.aligner import GenomeAligner

    rng = np.random.default_rng(0)
    genome = Genome.from_dict(
        {"chr1": "".join(rng.choice(list("ACGT"), size=30_000))})
    al = GenomeAligner(genome)
    rows = [(0, 1, np.arange(400, dtype=np.int64),
             np.arange(400, dtype=np.int64))] * 64
    groups = [(512, list(range(64)))]

    monkeypatch.setenv('CIRI_DEVICE_RTT_MS', '33')   # the tunnel
    monkeypatch.delenv('CIRI_CHAIN_ROUTE', raising=False)
    assert not al._device_chain_pays(rows, groups)
    monkeypatch.setenv('CIRI_DEVICE_RTT_MS', '0.5')  # local chip
    # marginal device cost collapses with the link; fixed ~2.75ms/group
    assert al._device_chain_pays(rows, groups)
    monkeypatch.setenv('CIRI_DEVICE_RTT_MS', '33')
    monkeypatch.setenv('CIRI_CHAIN_ROUTE', 'device')
    assert al._device_chain_pays(rows, groups)
    monkeypatch.setenv('CIRI_CHAIN_ROUTE', 'host')
    monkeypatch.setenv('CIRI_DEVICE_RTT_MS', '0.5')
    assert not al._device_chain_pays(rows, groups)


def test_host_speed_scale_calibration(tmp_path, monkeypatch):
    """VERDICT r4 #9: the chain router's host-side constant self-scales
    to the actual host.  A mocked 2x-slower probe must double the host
    estimate (flipping a near-boundary batch to the device side), a
    2x-faster probe must halve it (flipping to host); records persist
    keyed by host identity."""
    from ciri_long_tpu.utils import dispatch

    monkeypatch.setattr(dispatch, '_host_speed_path',
                        lambda: str(tmp_path / 'host_speed.json'))
    monkeypatch.delenv('CIRI_HOST_SPEED_SCALE', raising=False)
    monkeypatch.setattr(dispatch, '_HOST_PROBE_REF_S', 0.010)

    def fresh(probe_s):
        monkeypatch.setattr(dispatch, '_HOST_SCALE', None)
        monkeypatch.setattr(dispatch, '_host_probe', lambda: probe_s)
        try:
            os.remove(tmp_path / 'host_speed.json')
        except OSError:
            pass
        return dispatch.host_speed_scale()

    assert fresh(0.020) == 2.0
    assert fresh(0.005) == 0.5
    # clamped against absurd probes (noise can never swing routing >8x)
    assert fresh(1.0) == 8.0
    assert fresh(1e-9) == 0.25

    # persisted record is reused (no second probe)
    monkeypatch.setattr(dispatch, '_HOST_SCALE', None)
    monkeypatch.setattr(dispatch, '_host_probe',
                        lambda: (_ for _ in ()).throw(AssertionError))
    fresh_scale = dispatch.host_speed_scale()
    assert fresh_scale == 0.25
    # ...but a different host identity re-probes
    monkeypatch.setattr(dispatch, '_HOST_SCALE', None)
    monkeypatch.setattr(dispatch, '_host_identity', lambda: 'other-box')
    monkeypatch.setattr(dispatch, '_host_probe', lambda: 0.010)
    assert dispatch.host_speed_scale() == 1.0
    # env pin wins outright
    monkeypatch.setenv('CIRI_HOST_SPEED_SCALE', '1.75')
    assert dispatch.host_speed_scale() == 1.75


def test_chain_route_scales_with_host_speed(monkeypatch):
    """_device_chain_pays must flip a near-boundary batch when the host
    self-calibration says the host is 2x slower/faster than the
    reference machine."""
    import numpy as np

    from ciri_long_tpu.models.aligner import GenomeAligner
    from ciri_long_tpu.utils import dispatch

    monkeypatch.delenv('CIRI_CHAIN_ROUTE', raising=False)
    monkeypatch.setenv('CIRI_DEVICE_RTT_MS', '33')

    # craft a batch whose host estimate sits between the two scaled
    # sides of the device estimate: one group of 8x1000 padded anchors
    # -> est_dev ~ 51.5 + 1.8 = ~53 ms; host side 78125 anchors x
    # window 64 x 8 ns = 40 ms (scale 1) / 80 ms (scale 2)
    rows = [(0, 1, np.zeros(78125, np.int64), np.zeros(78125, np.int64))]
    groups = [(1000, [0])]

    aligner = GenomeAligner.__new__(GenomeAligner)  # no genome needed
    monkeypatch.setattr(dispatch, '_HOST_SCALE', None)
    monkeypatch.setenv('CIRI_HOST_SPEED_SCALE', '1.0')
    assert aligner._device_chain_pays(rows, groups) is False
    monkeypatch.setenv('CIRI_HOST_SPEED_SCALE', '2.0')
    assert aligner._device_chain_pays(rows, groups) is True
    monkeypatch.setenv('CIRI_HOST_SPEED_SCALE', '0.5')
    assert aligner._device_chain_pays(rows, groups) is False
