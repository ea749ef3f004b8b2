"""Online (live) estimator driver — the mimosa_node equivalent.

The reference's online entry point wires ROS callbacks to the managers with
an AsyncSpinner(2) plus a dedicated high-priority IMU callback queue on its
own thread (ref src/mimosa_node.cpp:22-54), guarded by four mutexes. The
TPU-native re-design keeps the concurrency at the edges and the estimator
core single-threaded and deterministic:

* ``push_imu`` is the high-priority path: it advances the host-rate
  :class:`~mimosa_tpu.imu.propagation.Propagator` synchronously on the
  caller's thread (pure numpy, microseconds — ref imu/manager.cpp:98-161)
  and emits the low-latency odometry callback, then enqueues the sample
  for the graph worker.
* All graph work (Sequencer device programs) runs on ONE worker thread
  draining the event queue in arrival order — the ordering the reference
  gets from its callback queues, without the mutexes (the sequencer is
  only ever touched by the worker).
* Scans are staged (H2D transfer started) on the pusher's thread and held
  back until the IMU buffer has advanced past the scan end — the
  lidar_collection_delay queue of the offline harness applied online
  (ref src/mimosa_rosbag.cpp:111-115). Radar/odometry events hold until
  IMU covers their timestamp.
* After every graph update the newest optimized state is extracted by a
  tiny jitted program (an eager slice would knock a tunneled session off
  the streamed dispatch path — see CLAUDE.md) and copied device→host
  asynchronously; when it resolves the propagator is rebased
  (ref setPropagationBaseState, imu/manager.cpp:484-494).

Backpressure: if more than ``max_pending_scans`` scans are queued/held the
newest scan is dropped and counted (``scans_dropped_backlog``) — the
behavior a real-time deployment needs when compute falls behind, which the
reference delegates to ROS subscriber queue sizes.
"""

from __future__ import annotations

import logging
import queue
import threading

import numpy as np

logger = logging.getLogger(__name__)


def _make_state_extractor():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def extract(window, slot):
        return jnp.concatenate([
            window.q[slot], window.p[slot], window.v[slot],
            window.bg[slot], window.ba[slot], window.g_dir])

    return extract


class OnlineEstimator:
    """Thread-safe live front door around a :class:`Sequencer`.

    Parameters
    ----------
    seq : mimosa_tpu.graph.sequencer.Sequencer
        A fresh sequencer (owned exclusively by this driver's worker).
    on_propagated : callable(ts, q, p, v) or None
        High-rate output, called on the ``push_imu`` caller's thread for
        every IMU sample once the propagator has a base state.
    on_state : callable(ts, q, p, v, bg, ba, g_dir) or None
        Graph-rate output, called on the worker thread after each
        optimized-state rebase.
    collection_slack : float
        Extra seconds of IMU data required past a scan's end before the
        scan is processed (deskew needs coverage through t_end).
    max_pending_scans : int
        Backlog bound; scans beyond it are dropped (newest-dropped).
    stage_on_push : bool
        True starts each scan's pack + H2D transfer on the pusher's
        thread (overlaps the worker's device dispatches — right for a
        locally attached chip). False defers staging to the worker: on a
        tunneled/relayed device, cross-thread dispatch+transfer contention
        measurably halves throughput (see CLAUDE.md failed experiments).
    """

    def __init__(self, seq, g_mag=9.81, on_propagated=None, on_state=None,
                 collection_slack=0.0, max_pending_scans=8,
                 stage_on_push=True, debug_stream=None):
        from mimosa_tpu.imu.propagation import Propagator

        self.seq = seq
        # io.viz.DebugStream for the live dashboard; emitted from the
        # worker thread (the thread that owns the sequencer — the query
        # APIs are not safe from other threads, see sequencer.py)
        self.debug_stream = debug_stream
        self.on_propagated = on_propagated
        self.on_state = on_state
        self.collection_slack = float(collection_slack)
        self.max_pending_scans = int(max_pending_scans)
        self.stage_on_push = bool(stage_on_push)
        self.propagator = Propagator(g_mag=g_mag)
        self.counters = {"imu": 0, "scans": 0, "radar": 0, "odom": 0,
                         "scans_dropped_backlog": 0, "rebases": 0}
        self._prop_lock = threading.Lock()
        self._queue = queue.SimpleQueue()
        self._n_pending_scans = 0        # queued + held (worker-adjusted)
        self._pending_lock = threading.Lock()
        self._held = []                  # events waiting for IMU coverage
        self._extract = _make_state_extractor()
        self._pending_state = None       # (ts, device handle) in flight
        self._latest_state = None        # last resolved EstimatorState
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="mimosa-graph-worker")
        self._worker.start()

    # ------------------------------------------------------------- pushers

    def push_imu(self, ts, acc, gyro):
        """High-priority path: propagate + emit immediately, then enqueue
        for the graph worker. Returns the propagated (q, p, v) or None."""
        self.counters["imu"] += 1
        acc = np.asarray(acc, float)
        gyro = np.asarray(gyro, float)
        with self._prop_lock:
            out = self.propagator.add_imu(ts, acc, gyro)
        if out is not None and self.on_propagated is not None:
            self.on_propagated(float(ts), *out)
        self._queue.put(("imu", (float(ts), acc, gyro)))
        return out

    def push_scan(self, ts_header, points, t_rel, valid=None,
                  intensity=None):
        """Stage the scan (starts the H2D transfer on this thread so it
        overlaps in-flight device work) and enqueue it. Returns False if
        the backlog bound dropped it."""
        with self._pending_lock:
            if self._n_pending_scans >= self.max_pending_scans:
                self.counters["scans_dropped_backlog"] += 1
                return False
            self._n_pending_scans += 1
        if self.stage_on_push:
            payload = self.seq.stage_scan(ts_header, points, t_rel, valid,
                                          intensity)
        else:
            payload = ("raw", ts_header, points, t_rel, valid, intensity)
        self.counters["scans"] += 1
        self._queue.put(("scan", payload))
        return True

    def push_radar(self, ts, points_r, doppler, snr_db=None):
        self.counters["radar"] += 1
        self._queue.put(("radar", (float(ts), np.asarray(points_r),
                                   np.asarray(doppler),
                                   None if snr_db is None
                                   else np.asarray(snr_db))))

    def push_odometry(self, ts, q_s, t_s, cov6=None):
        self.counters["odom"] += 1
        self._queue.put(("odom", (float(ts), np.asarray(q_s, float),
                                  np.asarray(t_s, float),
                                  None if cov6 is None
                                  else np.asarray(cov6, float))))

    # -------------------------------------------------------------- queries

    def current_state(self):
        """Latest optimized state snapshot (the online analogue of
        graph::Manager::getCurrentState, ref graph/manager.hpp:128).
        Thread-safe: returns the immutable snapshot published by the worker
        after each rebase; None before the first optimized state lands."""
        return self._latest_state

    def current_pose(self):
        """IMU-rate propagated (ts, q, p, v) — the low-latency high-rate
        output (ref imu/manager.cpp:98-161). None until the propagator has
        a base state."""
        with self._prop_lock:
            pr = self.propagator
            if not pr.ready or pr.ts is None:
                return None
            return (float(pr.ts), pr.q.copy(), pr.p.copy(), pr.v.copy())

    # ------------------------------------------------------------ lifecycle

    def stop(self, drain=True, timeout=60.0):
        """Stop the worker. With ``drain`` the remaining queue is processed
        (held scans whose IMU coverage never arrives are discarded)."""
        self._queue.put(("stop", drain))
        self._worker.join(timeout)
        self._stop.set()

    def flush(self, timeout=60.0):
        """Block until every event pushed so far has been consumed by the
        worker (held scans may still be waiting on IMU coverage)."""
        done = threading.Event()
        self._queue.put(("flush", done))
        return done.wait(timeout)

    # -------------------------------------------------------------- worker

    def _run(self):
        while True:
            try:
                kind, payload = self._queue.get(timeout=0.05)
            except queue.Empty:
                self._resolve_rebase()
                continue
            if kind == "stop":
                if payload:               # drain
                    self._drain_remaining()
                self._resolve_rebase()
                return
            if kind == "flush":
                payload.set()
                continue
            try:
                self._handle(kind, payload)
            except Exception:             # keep the worker alive
                logger.exception("online worker: %s event failed", kind)

    def _handle(self, kind, payload):
        seq = self.seq
        if kind == "imu":
            # consume any landed state copy first: by the next IMU event the
            # async D2H has virtually always resolved, so this is free
            self._resolve_rebase()
            seq.add_imu(*payload)
            self._release_held()
            return
        # exteroceptive events wait for IMU coverage of their end time
        if kind == "scan":
            if isinstance(payload, tuple) and payload[0] == "raw":
                payload = seq.stage_scan(*payload[1:])
            need = payload["t_end"] + self.collection_slack
        else:
            need = payload[0]
        if len(seq.imu) == 0 or seq.imu.t_last < need:
            self._held.append((need, kind, payload))
            return
        self._process(kind, payload)

    def _release_held(self):
        if not self._held:
            return
        t_last = self.seq.imu.t_last
        ready = [h for h in self._held if h[0] <= t_last]
        if not ready:
            return
        self._held = [h for h in self._held if h[0] > t_last]
        for _, kind, payload in sorted(ready, key=lambda h: h[0]):
            self._process(kind, payload)

    def _process(self, kind, payload):
        seq = self.seq
        if kind == "scan":
            seq.add_scan(payload["ts_header"], staged=payload)
            with self._pending_lock:
                self._n_pending_scans -= 1
            if self.debug_stream is not None:
                self.debug_stream.emit(seq)
        elif kind == "radar":
            ts, pts, dop, snr = payload
            seq.add_radar(ts, pts, dop, snr_db=snr)
        elif kind == "odom":
            ts, q_s, t_s, cov6 = payload
            seq.add_odometry(ts, q_s, t_s, cov6=cov6)
        if seq.initialized and seq.n_active > 0:
            self._request_rebase()

    # ------------------------------------------------------ state extraction

    def _request_rebase(self):
        """Kick off the newest-state extraction: one jitted dispatch + an
        async D2H copy; the result is consumed when it lands (never blocks
        the worker behind the tunnel's round-trip)."""
        import jax.numpy as jnp

        seq = self.seq
        handle = self._extract(seq.window,
                               jnp.asarray(seq.n_active - 1, jnp.int32))
        try:
            handle.copy_to_host_async()
        except Exception:
            pass                          # platforms without async copy
        self._pending_state = (seq.last_state_ts, handle)

    def _resolve_rebase(self):
        if self._pending_state is None:
            return
        ts, handle = self._pending_state
        self._pending_state = None
        s = np.asarray(handle, dtype=float)
        q, p, v, bg, ba, g = (s[0:4], s[4:7], s[7:10], s[10:13], s[13:16],
                              s[16:19])
        with self._prop_lock:
            self.propagator.set_base_state(ts, q, p, v, bg, ba, g)
        from mimosa_tpu.graph.sequencer import EstimatorState
        self._latest_state = EstimatorState(float(ts), q, p, v, bg, ba, g)
        self.counters["rebases"] += 1
        if self.on_state is not None:
            self.on_state(float(ts), q, p, v, bg, ba, g)

    def _drain_remaining(self):
        while True:
            try:
                kind, payload = self._queue.get_nowait()
            except queue.Empty:
                break
            if kind == "stop":
                continue
            if kind == "flush":
                payload.set()
                continue
            try:
                self._handle(kind, payload)
            except Exception:
                logger.exception("online worker drain: %s failed", kind)
        if self._held:
            logger.info("online: %d events still waiting for IMU coverage "
                        "at stop", len(self._held))
            with self._pending_lock:
                self._n_pending_scans -= sum(
                    1 for h in self._held if h[1] == "scan")
            self._held.clear()
