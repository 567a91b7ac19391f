"""Backend health probing.

Remote/tunneled accelerators can hang indefinitely at backend
initialization (no error, no timeout from XLA's side).  For interactive
entry points that would otherwise freeze — the CLI, the bench — probe the
default backend in a *subprocess* with a hard timeout before letting the
parent process initialize it, and fall back to CPU when it is unreachable.

Must be called BEFORE anything initializes the jax backend in the calling
process (jax.config can only switch platforms pre-initialization).
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE = "import jax, jax.numpy as jnp; print(jnp.ones(2).sum())"


def accelerator_healthy(timeout_s: float = 120.0,
                        attempts: int = 2,
                        backoff_s: float = 0.0) -> bool:
    """True when the default jax backend initializes and runs one op.

    Tunneled backends flap on a timescale of seconds-to-minutes — one
    probe can hang while the next connects in under ten — so retry before
    declaring the accelerator unreachable.  ``backoff_s`` sleeps between
    failed attempts so the retry window can span the minutes-scale flaps
    (a failed probe itself only burns time when the tunnel hangs; when it
    refuses fast, backoff is what stretches the window)."""
    import time as _time
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE],
                               timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if backoff_s and i + 1 < attempts:
            _time.sleep(backoff_s)
    return False


def ensure_reachable_backend(timeout_s: float = 120.0) -> bool:
    """Fall back to CPU when the default backend is unreachable.

    Returns True when the accelerator is used, False on CPU fallback.
    Skipped (trusting the default backend) when SDR_TPU_NO_PROBE is set —
    for local backends the probe is pure startup latency.
    """
    if os.environ.get("SDR_TPU_NO_PROBE"):
        return True
    import jax
    if str(jax.config.jax_platforms or "").split(",")[0] == "cpu":
        # the process is already pinned to CPU (tests, explicit fallback):
        # probing the accelerator would only burn the probe timeout
        return False
    if accelerator_healthy(timeout_s):
        return True
    import jax
    jax.config.update("jax_platforms", "cpu")
    print("# accelerator unreachable; falling back to CPU",
          file=sys.stderr)
    return False
