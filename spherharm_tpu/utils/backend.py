"""TPU-backend availability probes (axon remote-compile relay).

On this machine the TPU backend is reached through a loopback
remote-compile relay at 127.0.0.1:8103. When that service is down,
*any* JAX backend touch (``jax.devices()``, first jit) in a process not
forced to CPU HANGS indefinitely — there is no timeout in the plugin.
Driver-facing artifacts (bench.py, __graft_entry__) therefore must
decide CPU-vs-TPU *before* initializing the backend, using the cheap
socket probe here, and fail fast with a clear message instead of
hanging (round-3 lost its measurement gates to exactly this:
MULTICHIP_r03.json rc=124 was a jax.devices() hang during an outage).

Analogue in the reference architecture: LAMMPS aborts with
``Error::universe_all`` when MPI is unusable rather than deadlocking in
MPI_Init (SURVEY.md section 5.2-5.3); this module is that guard for the
XLA/axon backend.
"""

from __future__ import annotations

import os
import socket

AXON_RELAY_ADDR = ("127.0.0.1", 8103)


def relay_up(timeout: float = 3.0) -> bool:
    """True iff the axon remote-compile relay accepts TCP connections."""
    try:
        with socket.create_connection(AXON_RELAY_ADDR, timeout=timeout):
            return True
    except OSError:
        return False


def forced_cpu() -> bool:
    """True iff this process is already pinned to the CPU backend.

    CPU needs BOTH the env var (read before jax import) and, in-process,
    a ``jax.config.update('jax_platforms', 'cpu')`` — the axon plugin
    force-prepends itself at import otherwise. Scripts in this repo set
    both when JAX_PLATFORMS=cpu is in the env, so the env var is the
    reliable signal *before* any jax import.
    """
    return os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"


def tpu_usable(timeout: float = 3.0) -> bool:
    """True iff touching the default (TPU) backend will not hang."""
    return relay_up(timeout=timeout)


def require_tpu_or_die(context: str) -> None:
    """Fail fast (SystemExit, seconds) when the TPU path would hang.

    No-op when the process is pinned to CPU or the relay answers.
    """
    if forced_cpu() or relay_up():
        return
    raise SystemExit(
        f"{context}: axon TPU relay down "
        f"(tcp connect to {AXON_RELAY_ADDR[0]}:{AXON_RELAY_ADDR[1]} "
        "failed; jax.devices() would hang indefinitely). Retry when the "
        "service answers, or force the CPU backend with JAX_PLATFORMS=cpu."
    )
