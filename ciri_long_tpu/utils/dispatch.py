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
