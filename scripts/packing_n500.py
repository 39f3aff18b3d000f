"""Config-2 QUANTITATIVE acceptance: n=500 settling packing fraction.

BASELINE.json:8 asks for a packing-fraction validation of ellipsoid-like
particles settling under gravity at ~500 particles. Loose random
pourings of frictional ellipsoids (aspect ~1.4:1.1:1) land between
random-loose and random-close packing: phi ~ 0.52-0.64 depending on
friction (mu=0.4 here biases low-mid). The CI-sized n=64 test asserts
only a sanity window; THIS run produces the recorded number.

Usage: python scripts/packing_n500.py [n] [max_blocks]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from spherharm_tpu.core import computes  # noqa: E402
from spherharm_tpu.models import scenarios  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    max_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    sim, state, neigh = scenarios.settling_box(
        n=n, lmax=2, dt=2e-4, gamma_n=400.0, mu=0.4, k_max=24,
    )
    e_peak = 0.0
    for blk in range(max_blocks):
        state, neigh = sim.run(state, neigh, 1000)
        ke = float(computes.mean_kinetic_energy(state, sim.shapes))
        e_peak = max(e_peak, ke)
        phi = float(computes.packing_fraction_box(state, sim.shapes))
        print(f"block {blk:3d}  ke/atom {ke:.3e}  phi {phi:.4f}",
              flush=True)
        if e_peak > 0 and ke < 5e-4 * e_peak:
            break
    n_act = int(state.n_active)
    assert n_act == n, f"lost particles: {n_act}/{n}"
    ovf = int(neigh.overflow)
    print(f"# overflow {ovf} (pair cap {sim.pair_capacity})")
    print(f"# RESULT: packing fraction phi = {phi:.4f} at n={n} "
          f"(expected window 0.50-0.66 for mu=0.4 ellipsoids)")


if __name__ == "__main__":
    main()
