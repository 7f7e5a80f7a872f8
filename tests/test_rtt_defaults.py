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
