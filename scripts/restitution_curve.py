"""Restitution-vs-damping validation curve (config 1, BASELINE.json:7).

Runs the two-body head-on collision over a gamma_n sweep IN ONE compiled
program (vmapped replicas, parallel/ensemble.py) and prints the
restitution table — the classic DEM validation the reference fork is
benchmarked with ("restitution check vs reference CPU run").

Usage: python scripts/restitution_curve.py [n_gammas]
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from spherharm_tpu.models import scenarios  # noqa: E402
from spherharm_tpu.parallel import ensemble  # noqa: E402


def main():
    n_g = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sim, state, neigh = scenarios.two_body_collision(gamma_n=0.0, dt=2e-4)
    gammas = jnp.asarray(np.linspace(0.0, 700.0, n_g), jnp.float32)
    states = ensemble.replicate(state, n_g)
    neighs = ensemble.replicate(neigh, n_g)
    params = ensemble.with_param_sweep(sim.params, gamma_n=gammas)
    s_out, _ = ensemble.run_replicas(sim, states, neighs, params, 3000)
    e = -np.asarray(s_out.v)[:, 0, 0]  # outgoing / incoming (v0 = 1)
    print(f"{'gamma_n':>10} {'restitution':>12}")
    for g, ei in zip(np.asarray(gammas), e):
        print(f"{g:>10.1f} {ei:>12.5f}")
    assert e[0] > 0.995, "elastic limit must give e ~ 1"
    assert np.all(np.diff(e) < 1e-3), "e must decrease with damping"
    print("# monotone restitution curve OK")


if __name__ == "__main__":
    main()
