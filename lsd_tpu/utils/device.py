"""Device session keep-alive for tunneled TPU transports.

On the axon tunnel, the device grant expires if no device op happens for
~1 min after process start (or between ops during long host-side phases
like world generation / reference-binary runs); the client then blocks
forever waiting to re-claim.  ``keep_session_alive()`` claims the device
immediately and heartbeats a trivial transfer every 15 s from a daemon
thread so long host phases can't lose the session.

No-op overhead: one 4-byte device round-trip per 15 s.
"""
from __future__ import annotations

import threading
import time

_started = False
_lock = threading.Lock()


def keep_session_alive(period_s: float = 15.0) -> None:
    global _started
    with _lock:
        if _started:
            return
        _started = True
    import jax
    import jax.numpy as jnp
    _ = jax.device_get(jnp.zeros(1))      # claim now (+ sync timing mode)

    def _beat():
        while True:
            time.sleep(period_s)
            try:
                _ = jax.device_get(jnp.zeros(1))
            except Exception:
                return

    threading.Thread(target=_beat, daemon=True,
                     name="device-keepalive").start()
