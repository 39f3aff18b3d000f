"""spherharm_tpu — a TPU-native DEM engine for spherical-harmonic particles.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
LAMMPS-SPHERHARM fork (reference: /root/reference/README.md:2 — "SPHERHARM
Package to simulate complex shaped granular particles"): granular particles
whose surfaces are real spherical-harmonic expansions
``r(theta, phi) = sum a_nm Y_nm(theta, phi)``, contact via Gauss-Legendre
surface quadrature, Hertz/Coulomb force + torque, quaternion rigid-body
velocity-Verlet integration, cell-list/Verlet neighbor tensors, spatial
sharding with halo exchange over a ``jax.sharding.Mesh``.

Design stance (see SURVEY.md section 7): state is one pytree; every per-step
computation is a jitted pure function over fixed-capacity masked tensors;
parallelism is slab domain decomposition expressed with ``shard_map`` +
``lax.ppermute`` instead of MPI.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: step graphs are large (unrolled SH
# recurrences + scanned integrator); caching makes reruns of benchmarks
# and tests start in seconds instead of minutes. Opt out with
# SPHERHARM_JAX_CACHE=0.
if _os.environ.get("SPHERHARM_JAX_CACHE", "1") != "0":
    # Partition by platform AND remote-compile mode: AOT artifacts embed
    # the COMPILING host's machine features, so CPU executables produced
    # by the axon remote helper (PALLAS_AXON_REMOTE_COMPILE=1, the
    # machine default) are feature-incompatible with this host's CPU —
    # loading them warns at best and segfaults inside the cache reader
    # at worst (observed in a full-suite run). Keeping the two worlds in
    # separate directories makes every cached entry loadable by the
    # process class that wrote it.
    _plat = str(_jax.config.jax_platforms or "default").replace(",", "_")
    _rc = _os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "1")
    _plat = f"{_plat}-rc{_rc}"
    # CPU executables are AOT-compiled for the COMPILING host's machine
    # features, and this cache directory can be shared across machine
    # classes (observed: a cpu-rc0 partition polluted with entries
    # carrying +prefer-no-scatter/+amx features this host lacks — every
    # load warns and can SIGILL). Key CPU partitions by a fingerprint of
    # the host's CPU flags so each machine class only loads its own.
    if "cpu" in _plat:
        try:
            import hashlib as _hashlib

            with open("/proc/cpuinfo") as _f:
                for _line in _f:
                    if _line.startswith("flags"):
                        _fp = _hashlib.sha1(
                            _line.encode()
                        ).hexdigest()[:8]
                        _plat = f"{_plat}-{_fp}"
                        break
        except OSError:
            pass
    _cache = _os.path.join(
        _os.environ.get(
            "SPHERHARM_JAX_CACHE_DIR",
            _os.path.expanduser("~/.cache/spherharm_jax"),
        ),
        _plat,
    )
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spherharm_tpu.core.state import State, Shapes, NeighborState, SimParams  # noqa: F401
from spherharm_tpu.core.simulation import Simulation  # noqa: F401
