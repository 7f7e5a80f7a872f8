"""Work-stealing drain shared by the scan and collapse stages.

A spawn pool consumes payloads from the FRONT of the pending list while
the main process (device path) steals from the BACK; both stop when the
cursors meet.  Throughput adds instead of choosing a side (the round-3
either/or routing left 1157 device items/s idle at -t4, or 756-1527
host items/s idle at --dist mesh, depending on genome size -- see
BASELINE.md round 3).

Outputs stay byte-identical to the pooled / serial paths because the
device and host chunk functions are themselves byte-identical
(forced-device diff tests) and the consumer drains results strictly in
payload order regardless of which side produced them.

The reference has no analog (its pools are plain mp.Pool fan-outs,
find_bsj.py:344, collapse.py:848); this is the TPU-first replacement
that lets a tunnel-attached accelerator ADD to host throughput instead
of gating an either/or routing decision.
"""

import threading
import time


class HybridDrain:
    """Work-stealing split between a multiprocessing pool and a local
    (device-path) runner.

    The pool is fed with apply_async at a bounded depth (workers + 2);
    each completion submits the next front chunk, so un-started chunks
    remain stealable.  The device thread leaves the last ``nworkers``
    un-started chunks to the pool, and once the pool runs out of fresh
    chunks it RACES any still-running device chunk (chunk functions are
    pure, delivery is first-result-wins) -- a slow device chunk (e.g.
    one paying cold remote compiles) can then never become the critical
    path of the drain: measured 80 s vs 6 s scan walls when one early
    steal absorbed a cold compile cascade, round-5 BASELINE.md.

    ``device_width`` > 1 runs that many stealer threads concurrently --
    the collapse stage uses it so per-cluster device dispatch chains
    overlap their tunnel round-trips even when each payload is a single
    cluster (each thread blocks in a device fetch while the others
    dispatch)."""

    def __init__(self, pool, nworkers, worker_fn, run_local, payloads,
                 device_width=1):
        self._pool = pool
        self._worker_fn = worker_fn
        self._run_local = run_local
        self._payloads = payloads          # list of (ci, payload)
        self._head = 0
        self._tail = len(payloads)
        self._cv = threading.Condition()
        self._done = {}
        self._err = None
        self._inflight = 0
        self._nworkers = nworkers
        self._claimed = {}                 # ci -> payload, device in flight
        self._raced = set()                # device chunks re-given to pool
        self.stolen = 0                    # device-side chunk count
        self.raced = 0                     # pool-side backup submissions
        self._t0 = time.monotonic()
        self._pool_completed = 0
        self._dev_last_wall = None
        with self._cv:
            for _ in range(min(nworkers + 2, len(payloads))):
                self._submit_front()
        self._threads = [
            threading.Thread(target=self._device_loop, daemon=True,
                             name='ciri-hybrid-device-%d' % i)
            for i in range(max(1, device_width))]
        for t in self._threads:
            t.start()

    def _submit_front(self):
        # cv held
        if self._head < self._tail:
            ci, payload = self._payloads[self._head]
            self._head += 1
            self._inflight += 1
            self._pool.apply_async(self._worker_fn, (payload,),
                                   callback=self._make_cb(ci),
                                   error_callback=self._on_error)
            return
        # no fresh chunks left: back up any device chunk still in
        # flight (first result wins; results are identical either way)
        for ci, payload in list(self._claimed.items()):
            if ci in self._raced or ci in self._done:
                continue
            self._raced.add(ci)
            self.raced += 1
            self._inflight += 1
            self._pool.apply_async(self._worker_fn, (payload,),
                                   callback=self._make_cb(ci),
                                   error_callback=self._on_error)
            return

    def _make_cb(self, ci):
        def cb(res):
            with self._cv:
                self._inflight -= 1
                self._pool_completed += 1
                if ci not in self._done:
                    self._done[ci] = res
                self._submit_front()
                self._cv.notify_all()
        return cb

    # A device chunk's host-side staging displaces pool CPU on a
    # fully-subscribed box, so even a within-budget slow steal drags the
    # drain: 5-pair 12.5k measurement put the factor-3.0 scan mean 5%
    # behind the pool-only path, with fast-tunnel runs (device chunks
    # ~ pool chunks) BEATING it.  1.5 keeps only those.
    steal_factor = 1.5

    def _steal_pays(self):
        # cv held.  Adaptive throttle: a device chunk that runs much
        # slower than a pool worker's chunk also STEALS HOST CPU for its
        # staging; past steal_factor x a pool chunk's wall the steal is
        # a net loss; stop until drained.  First steal is always allowed
        # (no data yet) -- the pool race bounds its downside.
        if self._dev_last_wall is None or self._pool_completed < 2:
            return True
        elapsed = time.monotonic() - self._t0
        pool_chunk_wall = elapsed * self._nworkers / self._pool_completed
        return self._dev_last_wall <= self.steal_factor * pool_chunk_wall

    def _on_error(self, exc):
        with self._cv:
            self._inflight -= 1
            self._err = exc
            self._cv.notify_all()

    def _device_loop(self):
        while True:
            with self._cv:
                if self._err is not None:
                    return
                if self._tail - self._head <= self._nworkers:
                    return
                if not self._steal_pays():
                    return
                self._tail -= 1
                ci, payload = self._payloads[self._tail]
                self._claimed[ci] = payload
            t0 = time.monotonic()
            try:
                res = self._run_local(payload)
            except BaseException:
                # device-side failure: hand the chunk straight back to
                # the pool (chunk fns are pure; a dying device must not
                # kill a run the host can finish) and stop stealing.
                # Only a POOL failure on the backup fails the drain.
                with self._cv:
                    if ci not in self._done and ci not in self._raced:
                        self._raced.add(ci)
                        self.raced += 1
                        self._inflight += 1
                        self._pool.apply_async(
                            self._worker_fn, (payload,),
                            callback=self._make_cb(ci),
                            error_callback=self._on_error)
                    self._cv.notify_all()
                return
            with self._cv:
                self._claimed.pop(ci, None)
                self._dev_last_wall = time.monotonic() - t0
                if ci not in self._done:
                    self._done[ci] = res
                self.stolen += 1
                self._cv.notify_all()

    def result(self, ci):
        """Blocking fetch of chunk ci's result (consumer drains in order)."""
        with self._cv:
            while ci not in self._done:
                if self._err is not None:
                    raise RuntimeError(
                        'hybrid drain failed: %r' % (self._err,)) \
                        from (self._err if isinstance(self._err,
                                                      BaseException)
                              else None)
                self._cv.wait(1.0)
            return self._done.pop(ci)
