"""Numerical sanitizers — the reference's sanitizer/CI role, TPU-style.

SURVEY.md section 5.2: the reference relies on ASan/UBSan builds; the
pure-functional JAX design has no shared-memory races, so the TPU
equivalents are (a) NaN/Inf detection, (b) capacity-overflow audits of
the fixed-size tensors, (c) determinism checks (same seed => identical
trajectory).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_finite(state, where: str = "") -> None:
    """Raise if any dynamic field holds NaN/Inf (host-side audit)."""
    bad = {}
    for f in ("x", "v", "q", "angmom", "f", "tau"):
        arr = np.asarray(getattr(state, f))
        act = np.asarray(state.active)
        vals = arr[act] if arr.ndim > 1 else arr[act]
        if not np.isfinite(vals).all():
            bad[f] = int((~np.isfinite(vals)).sum())
    if bad:
        raise FloatingPointError(f"non-finite state {where}: {bad}")


def audit_capacities(sim, neigh) -> dict:
    """Report fixed-capacity headroom (neighbor K, pair slots, cells).

    Returns {name: (used, capacity)}; any used > capacity means physics
    was silently truncated and capacities must be raised (SURVEY.md 7.1:
    'overflow is detected and triggers a re-allocation with larger K').
    """
    used = int(neigh.overflow)
    report = {
        "neighbor_or_cell_max": (used, sim.k_max),
    }
    if getattr(sim, "pair_capacity", 0):
        report["pair_slots"] = (used, sim.pair_capacity)
    return report


def assert_no_overflow(sim, neigh) -> None:
    ovf = int(neigh.overflow)
    if hasattr(sim, "pair_capacity") and sim.pair_capacity:
        if ovf > sim.pair_capacity:
            raise RuntimeError(
                f"pair capacity overflow: {ovf} > {sim.pair_capacity}"
            )


def determinism_check(run_fn, make_inputs, n: int = 2) -> bool:
    """Same inputs => bitwise-identical outputs (XLA determinism audit)."""
    outs = []
    for _ in range(n):
        out = run_fn(*make_inputs())
        outs.append(jax.tree.map(lambda a: np.asarray(a), out))
    ref = outs[0]
    for other in outs[1:]:
        ok = jax.tree.all(
            jax.tree.map(lambda a, b: np.array_equal(a, b), ref, other)
        )
        if not ok:
            return False
    return True


def enable_nan_debugging() -> None:
    """Turn on jax debug_nans (traps the first NaN-producing op)."""
    jax.config.update("jax_debug_nans", True)
