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

from spherharm_tpu.core.state import State, Shapes, NeighborState, SimParams  # noqa: F401
