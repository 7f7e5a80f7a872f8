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
    plat = (jax.config.jax_platforms or os.environ.get('JAX_PLATFORMS')
            or 'default').split(',')[0] or 'default'
    cache = os.environ.get('JAX_COMPILATION_CACHE_DIR')
    if cache is None:
        base = base_dir or os.path.join(os.path.expanduser('~'), '.cache',
                                        'ciri_long_tpu')
        cache = os.path.join(base, 'jax_cache_' + plat)
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


def cached_rtt_ms(max_age_s=86400.0):
    """Last persisted device RTT (ms) WITHOUT touching jax -- lets a new
    process decide its backend before any device initialises (flipping
    jax_platforms after the first device use is too late).  None when
    never measured or stale.  CIRI_DEVICE_RTT_MS overrides."""
    env = os.environ.get('CIRI_DEVICE_RTT_MS')
    if env:
        return float(env)
    try:
        import json
        with open(_rtt_cache_path()) as f:
            rec = json.load(f)
        if time.time() - rec['ts'] <= max_age_s:
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
                json.dump({'rtt_ms': _RTT_MS, 'ts': time.time()}, f)
            os.replace(tmp, path)
        except OSError:
            pass
    return _RTT_MS


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
