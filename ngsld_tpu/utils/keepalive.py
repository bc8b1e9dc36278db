"""Device-link keepalive.

On tunneled/remote accelerators the transport goes stale while the host
does file parsing or TSV formatting; the next synchronous device call then
pays a reconnect measured in tens of seconds (observed: 0.09 s warm vs
10-200 s after an idle window). A background thread round-trips a tiny op
whenever the link has been IDLE for `interval` seconds.

Activity-awareness matters: pinging while real work is in flight
serializes the remote device queue behind the ping's sync (measured 2-3x
on the whole banded sweep). Callers report device interactions via
`touch()`; pings fire only when no touch happened for `interval` seconds.
Disable with NGSLD_DEVICE_KEEPALIVE=0; on locally attached devices an
idle-window ping costs microseconds.
"""

from __future__ import annotations

import os
import threading
import time

import numpy as np


class DeviceKeepalive:
    def __init__(self, interval: float = 5.0):
        self.interval = interval
        self._stop = threading.Event()
        self._thread = None
        self._last = time.monotonic()
        self._held = 0
        self._lock = threading.Lock()

    def touch(self):
        """Record device activity; suppresses pings for `interval` seconds."""
        self._last = time.monotonic()

    def hold(self):
        """Context manager marking a device op IN FLIGHT: pings are fully
        suppressed until it exits (touch() only covers the `interval` after
        an op completes — a single transfer/compute longer than that would
        otherwise get pinged mid-flight and serialize behind the sync)."""
        ka = self

        class _Hold:
            def __enter__(self):
                with ka._lock:
                    ka._held += 1
                return self

            def __exit__(self, *exc):
                with ka._lock:
                    ka._held -= 1
                ka.touch()
                return False

        return _Hold()

    def __enter__(self):
        if os.environ.get("NGSLD_DEVICE_KEEPALIVE", "1") != "1":
            return self
        try:
            import jax.numpy as jnp
            z = jnp.zeros(8, jnp.float32)
            np.asarray(z)  # establish the connection before timing anything
        except Exception:
            return self
        self.touch()

        def ping():
            while not self._stop.wait(min(self.interval / 4, 1.25)):
                if self._held > 0 or \
                        time.monotonic() - self._last < self.interval:
                    continue
                try:
                    np.asarray(z + 1.0)
                    self.touch()
                except Exception:
                    return

        self._thread = threading.Thread(target=ping, name="ngsld-keepalive",
                                        daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        return False
