"""Device-dispatch accounting (diagnostic, env-gated).

Over the remote-tunnel TPU every blocking device call pays 50-200 ms of
RTT, so pipeline throughput is governed by DISPATCHES, not FLOPs.  Set
CIRI_DISPATCH_STATS=1 and every entry point wrapped with
@count_dispatch('name') accumulates (calls, wall seconds); a summary
prints to stderr at interpreter exit, or call report() directly.

Zero overhead when the env var is unset (the decorator returns the
function unchanged at import time).
"""

import atexit
import functools
import os
import sys
import time
from collections import defaultdict

_ENABLED = os.environ.get('CIRI_DISPATCH_STATS') not in (None, '', '0')
_STATS = defaultdict(lambda: [0, 0.0])


def count_dispatch(name):
    def deco(fn):
        if not _ENABLED:
            return fn

        @functools.wraps(fn)
        def wrapped(*a, **kw):
            t0 = time.monotonic()
            try:
                return fn(*a, **kw)
            finally:
                st = _STATS[name]
                st[0] += 1
                st[1] += time.monotonic() - t0
        return wrapped
    return deco


def backend_initialized():
    """Whether any jax backend has already initialised in this process,
    WITHOUT triggering initialisation.  Conservative: unknown -> True."""
    try:
        from jax._src import xla_bridge as xb
        return bool(xb._backends)
    except Exception:
        return True


_WARM_THREAD = None


def warm_backend_async():
    """Initialise the default jax backend on a daemon thread (remote-tunnel
    backends take ~5-10 s that would otherwise serialise in front of the
    first device use; pure host backends no-op in microseconds).  Call
    wait_backend_warm() before any fork-context multiprocessing.Pool:
    forking while this thread may hold import-machinery or PJRT-plugin
    locks can leave children with permanently-held mutexes (ADVICE r3)."""
    global _WARM_THREAD
    if _WARM_THREAD is not None:
        return _WARM_THREAD
    import threading

    def _warm():
        try:
            import jax
            jax.devices()
        except Exception:
            pass

    t = threading.Thread(target=_warm, daemon=True, name='ciri-backend-warm')
    t.start()
    _WARM_THREAD = t
    return t


def wait_backend_warm(timeout=None):
    """Join the warm-backend thread.  MUST be called before creating any
    fork-context Pool in a process that called warm_backend_async() --
    fork safety depends on the locks held at fork time, not on whether
    the children later touch jax.  No-op when the warm thread was never
    started.  Returns True when no warm thread is (still) running."""
    t = _WARM_THREAD
    if t is None:
        return True
    t.join(timeout)
    return not t.is_alive()


def _configured_platform():
    """The CONFIGURED jax platform string ('default' when unset) -- stable
    across a process's lifetime regardless of backend initialisation, so
    it is the right key for cross-process records (_link_identity)."""
    try:
        import jax
        plat = jax.config.jax_platforms
    except Exception:
        plat = None
    plat = plat or os.environ.get('JAX_PLATFORMS') or 'default'
    return plat.split(',')[0] or 'default'


def resolved_platform():
    """The jax platform this process is configured for, resolved WITHOUT
    initialising a backend: the actually-initialised backend name when one
    exists, else the configured jax_platforms / JAX_PLATFORMS value, else
    'default' (= whatever PJRT plugin registers first, the tunnel TPU on
    this box)."""
    try:
        from jax._src import xla_bridge as xb
        if xb._backends:
            return sorted(xb._backends)[0]
    except Exception:
        pass
    return _configured_platform()


def _machine_fingerprint():
    """Short hash of the machine-relevant XLA configuration.  Cache dirs
    are suffixed with it because jax's persistent-cache deserializer
    segfaults on machine-feature mismatches between entries written under
    different XLA_FLAGS (e.g. --xla_force_host_platform_device_count=8 vs
    plain CPU) -- see tests/conftest.py's jax_cache_cpu8 dir."""
    flags = os.environ.get('XLA_FLAGS', '')
    if not flags:
        return ''
    import hashlib
    return '_' + hashlib.sha1(flags.encode()).hexdigest()[:8]


def ensure_compile_cache(base_dir=None):
    """Enable the persistent XLA compile cache with settings that work on
    REMOTE (axon-tunnel) backends.

    The axon PJRT plugin compiles server-side and reports sub-second
    local compile times for programs whose remote compiles take minutes;
    jax's default ``persistent_cache_min_compile_time_secs=1.0`` (and even
    a 0.1 s bar) therefore persists almost nothing, and every fresh
    process re-pays every remote compile (measured 2026-08-19: 267 s ->
    0.55 s for one fori_loop program once the threshold is zeroed).
    Cache dirs are suffixed per-backend to keep concurrent CPU-test
    writers and TPU writers out of each other's entries (a shared dir
    produced a corrupt-entry segfault in jax.compilation_cache
    deserialization).  JAX_COMPILATION_CACHE_DIR still wins outright."""
    import jax

    # resolve the platform WITHOUT jax.default_backend(): that call
    # INITIALISES the backend (~5-10 s synchronously through the
    # tunnel), which would serialise in front of all host-side work
    plat = resolved_platform()
    cache = os.environ.get('JAX_COMPILATION_CACHE_DIR')
    if cache is None:
        base = base_dir or os.path.join(os.path.expanduser('~'), '.cache',
                                        'ciri_long_tpu')
        cache = os.path.join(base, 'jax_cache_' + plat
                             + _machine_fingerprint())
        os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
        if plat != 'cpu':
            # remote backends misreport compile times (see docstring);
            # CPU keeps jax's default 1 s bar -- its compile times are
            # real, and NOT caching trivial CPU programs avoids the
            # machine-feature AOT mismatch crash entirely for small runs
            jax.config.update('jax_persistent_cache_min_compile_time_secs',
                              0.0)
            jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except AttributeError:
        pass
    return cache


_RTT_MS = None


def _rtt_cache_path():
    return os.path.join(os.path.expanduser('~'), '.cache',
                        'ciri_long_tpu', 'device_rtt.json')


def _link_identity():
    """Cheap identity of the device link, computable WITHOUT initialising a
    backend: configured platform + the axon tunnel's pool env.  Persisted
    RTT records are keyed by it so a changed link (tunnel replaced by a
    locally attached chip, or vice versa) invalidates the record and
    triggers a live re-probe instead of silently routing stages to the
    wrong side for up to 24 h (ADVICE r3)."""
    return (_configured_platform() + '|'
            + os.environ.get('PALLAS_AXON_POOL_IPS', ''))


def cached_rtt_ms(max_age_s=86400.0):
    """Last persisted device RTT (ms) WITHOUT initialising a backend --
    lets a new process decide its backend before any device initialises
    (flipping jax_platforms after the first device use is too late).
    None when never measured, stale, or measured over a DIFFERENT link
    (see _link_identity).  CIRI_DEVICE_RTT_MS overrides."""
    env = os.environ.get('CIRI_DEVICE_RTT_MS')
    if env:
        return float(env)
    try:
        import json
        with open(_rtt_cache_path()) as f:
            rec = json.load(f)
        if (time.time() - rec['ts'] <= max_age_s
                and rec.get('link') == _link_identity()):
            return float(rec['rtt_ms'])
    except Exception:
        pass
    return None


def device_rtt_ms(force=False):
    """Measured dispatch+fetch round-trip to the default device, in ms
    (cached after the first call).  The pipeline's device-offload
    auto-defaults key off this: a locally attached chip measures <2 ms,
    the remote axon tunnel 30-200 ms, and several offloads only pay for
    themselves under a low-RTT link.  CIRI_DEVICE_RTT_MS overrides (for
    tests and for pinning a decision)."""
    global _RTT_MS
    env = os.environ.get('CIRI_DEVICE_RTT_MS')
    if env:
        return float(env)
    if _RTT_MS is None and not force:
        # a fresh persisted measurement (e.g. from the previous stage's
        # process) saves the ~0.5-2 s live probe at every stage start
        _RTT_MS = cached_rtt_ms(max_age_s=3600.0)
    if _RTT_MS is None or force:
        import jax
        import jax.numpy as jnp
        import numpy as np
        if jax.default_backend() == 'cpu':
            _RTT_MS = 0.0
            return _RTT_MS
        x = jnp.zeros((8, 128), jnp.int32)
        np.asarray(x + 1)                      # warm the dispatch path
        t0 = time.monotonic()
        np.asarray(x + 2)
        _RTT_MS = (time.monotonic() - t0) * 1000.0
        try:
            import json
            path = _rtt_cache_path()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + '.tmp.%d' % os.getpid()
            with open(tmp, 'w') as f:
                json.dump({'rtt_ms': _RTT_MS, 'ts': time.time(),
                           'link': _link_identity()}, f)
            os.replace(tmp, path)
        except OSError:
            pass
    return _RTT_MS


_HOST_SCALE = None

# Reference wall of _host_probe() on the calibration VM -- the machine
# the _HOST_CHAIN_NS / _DEV_CHAIN_US constants in models/aligner.py were
# fit on (2026-08-19 tunnel calibration; probe pinned 2026-08-20,
# median-of-3).  host_speed_scale() divides a fresh probe by this, so on
# a 2x faster host the chain cost model halves its host estimate instead
# of silently misrouting (VERDICT r4 #9).
_HOST_PROBE_REF_S = 0.0155  # best-of-8 on the idle 4-core calibration VM,
                            # 2026-08-20 (observed range 13.5-22 ms under
                            # ambient load; best-of-5 in _host_probe keeps
                            # the measured scale within the router's slack)


def _host_probe_workload():
    """Deterministic synthetic anchor set shaped like a scan chunk's
    chain input (sorted (r, q) anchor pairs, one contig)."""
    import numpy as np
    rng = np.random.default_rng(0xC1B1)
    n = 60_000
    r = np.sort(rng.integers(0, 5_000_000, size=n)).astype(np.int64)
    q = (r % 4096 + rng.integers(0, 64, size=n)).astype(np.int64)
    ctg = np.zeros(n, np.int64)
    return r, q, ctg


def _host_probe():
    """Wall seconds of a fixed chain-DP workload on the native core
    (best-of-3; ~25 ms on the calibration VM).  None when the native
    core is unavailable -- callers then fall back to scale 1.0 (the
    numpy chain fallback never routes through the cost model's hot
    branch anyway)."""
    try:
        from ciri_long_tpu import _chaincore
    except ImportError:
        return None
    r, q, ctg = _host_probe_workload()
    best = None
    for _ in range(5):
        t0 = time.perf_counter()
        _chaincore.chain(r, q, ctg, 15, 64, 5000, 5000)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _host_speed_path():
    return os.path.join(os.path.expanduser('~'), '.cache',
                        'ciri_long_tpu', 'host_speed.json')


def _host_identity():
    import platform
    return '{}|{}|{}'.format(platform.machine(), platform.node(),
                             os.cpu_count())


def host_speed_scale():
    """This host's serial-DP wall relative to the calibration reference
    host (>1 = slower host; the chain router multiplies its host-side
    estimate by it).  Measured once (~75 ms) at first use, persisted
    like the RTT record and keyed by a host identity so a migrated
    checkout re-probes instead of reusing a stale machine's number.
    CIRI_HOST_SPEED_SCALE pins; clamped to [0.25, 8] so a noisy probe
    can never swing routing by more than the model's own slack."""
    global _HOST_SCALE
    env = os.environ.get('CIRI_HOST_SPEED_SCALE')
    if env:
        return float(env)
    if _HOST_SCALE is not None:
        return _HOST_SCALE
    if _HOST_PROBE_REF_S is None:
        _HOST_SCALE = 1.0
        return _HOST_SCALE
    import json
    try:
        with open(_host_speed_path()) as f:
            rec = json.load(f)
        if (rec.get('host') == _host_identity()
                and time.time() - rec['ts'] <= 30 * 86400.0):
            _HOST_SCALE = float(rec['scale'])
            return _HOST_SCALE
    except Exception:
        pass
    probe = _host_probe()
    if probe is None:
        _HOST_SCALE = 1.0
        return _HOST_SCALE
    _HOST_SCALE = float(min(8.0, max(0.25, probe / _HOST_PROBE_REF_S)))
    try:
        path = _host_speed_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + '.tmp.%d' % os.getpid()
        with open(tmp, 'w') as f:
            json.dump({'scale': _HOST_SCALE, 'ts': time.time(),
                       'host': _host_identity(), 'probe_s': probe}, f)
        os.replace(tmp, path)
    except OSError:
        pass
    return _HOST_SCALE


def low_rtt_device_ready(threshold_ms=5.0):
    """True when a non-CPU backend over a LOCAL-grade link (< threshold_ms
    RTT) is known to be available WITHOUT paying a synchronous backend
    initialisation to find out: the persisted RTT record decides when
    fresh; a live probe runs only when a backend is already up; a cold
    cache with no backend answers False (conservative -- the host path).
    The device-offload auto-gates key off this.  CIRI_DEVICE_RTT_MS pins
    the decision either way."""
    rtt = cached_rtt_ms()
    if rtt is None:
        if not backend_initialized():
            return False
        rtt = device_rtt_ms()
    if rtt >= threshold_ms:
        return False
    import jax
    return jax.default_backend() != 'cpu'


def report(out=None):
    out = out or sys.stderr
    if not _STATS:
        return
    total = sum(w for _, w in _STATS.values())
    print('--- device dispatch stats (CIRI_DISPATCH_STATS) ---', file=out)
    for name, (calls, wall) in sorted(_STATS.items(),
                                      key=lambda kv: -kv[1][1]):
        print('{:28s} {:6d} calls {:9.2f} s  ({:.0f} ms/call)'.format(
            name, calls, wall, 1000.0 * wall / max(calls, 1)), file=out)
    print('{:28s} {:>6s}       {:9.2f} s'.format('TOTAL', '', total),
          file=out)


if _ENABLED:
    atexit.register(report)
