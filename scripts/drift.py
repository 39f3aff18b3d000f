"""Energy-drift measurement — the accuracy half of the primary metric.

BASELINE.json:2 "energy drift per 1M steps"; target "<1% energy drift
over 1M steps" (BASELINE.json:5). Scenario: two undamped Lmax=0 SH
spheres in a periodic (along x) box — they collide, separate, wrap
around and collide again forever, so the Hertzian contact path is
exercised thousands of times per million steps.

Energy is sampled only in free flight (pe_pair == 0): mid-contact
samples would fold in the analytic-PE-vs-quadrature-force mismatch,
which is a bounded bias, not drift.

Usage: python scripts/drift.py [n_steps] [report_block]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from spherharm_tpu.core.simulation import Simulation  # noqa: E402
from spherharm_tpu.core.state import SimParams  # noqa: E402
from spherharm_tpu.models import scenarios, shapes_library  # noqa: E402


def build_collider(dt=2e-4, radius=0.5, v0=1.0, kn=1e5):
    lmax = 0
    shapes = shapes_library.build_shapes(
        [shapes_library.sphere_coeffs(radius, lmax)], lmax,
        contact_quad=(12, 24),
    )
    params = SimParams.create(
        dt=dt, kn=kn, gamma_n=0.0, mu=0.0,
        skin=0.12 * radius, cutoff=2.0 * radius * 1.02,
    )
    Lx = 6.0 * radius  # both images separated by 3R at start
    state = scenarios.make_state(
        [[1.5 * radius, 0.0, 0.0], [4.5 * radius, 0.0, 0.0]],
        [0.0, -radius * 2, -radius * 2], [Lx, radius * 2, radius * 2],
        v=[[v0, 0.0, 0.0], [-v0, 0.0, 0.0]],  # approach -> collide -> wrap
    )
    sim = Simulation(
        shapes, params, neighbor_mode="allpairs", k_max=1,
        periodic=(True, False, False),
    )
    state, neigh = sim.init_neighbors(state)
    return sim, state, neigh


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    block = int(sys.argv[2]) if len(sys.argv) > 2 else max(n_steps // 40, 1)
    sim, state, neigh = build_collider()
    t0 = sim.thermo(state, neigh)
    e0 = float(t0["etot"])
    assert float(t0["pe_pair"]) == 0.0
    print(f"# e0 = {e0:.8g}", flush=True)
    done = 0
    samples = []
    while done < n_steps:
        state, neigh = sim.run(state, neigh, block)
        done += block
        t = sim.thermo(state, neigh)
        if float(t["pe_pair"]) > 0:
            continue  # mid-contact: skip (bounded PE-definition bias)
        e = float(t["etot"])
        drift = (e - e0) / abs(e0)
        per_m = drift * (1_000_000 / done)
        samples.append((done, e, per_m))
        print(f"step {done:>9d}  etot {e:.8g}  drift {drift:+.3e}  "
              f"-> {per_m:+.4%} / 1M steps", flush=True)
    per_m = samples[-1][2]
    ok = abs(per_m) < 0.01
    print(f"# RESULT: {per_m:+.4%} per 1M steps "
          f"({'PASS' if ok else 'FAIL'} vs <1% target)")


if __name__ == "__main__":
    main()
