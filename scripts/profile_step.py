"""Per-stage TPU timing of the drum step at bench scale.

Times, separately jitted and block_until_ready'd:
  rows     - particle_rows pack
  stage1   - r-only coarse containment probe over all candidate pairs
  gather2  - stage-2 survivor compaction gathers (the packed[sel] cost)
  stage2   - full-gradient kernel at the survivor count
  full     - contact_force_pairs as the step runs it
  step     - one whole step via sim.run
  rebuild  - neighbor rebuild

Usage: python scripts/profile_step.py [n] [lmax]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from spherharm_tpu.models import scenarios
from spherharm_tpu.ops import contact, contact_pallas


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    lmax = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    stage2 = int(os.environ.get("PROF_STAGE2", 5 * n))
    sim, state, neigh = scenarios.rotating_drum(
        n=n, lmax=lmax, k_max=24, use_pallas=True,
        rebuild_every=20, stage2_capacity=stage2,
    )
    print(f"# n={n} lmax={lmax} pair_cap={sim.pair_capacity} "
          f"stage2_cap={stage2}", flush=True)
    # Settle into a representative contact-rich configuration.
    state, neigh = sim.run(state, neigh, 100)
    jax.block_until_ready(state.x)

    P = sim.pair_capacity
    shapes, params = sim.shapes, sim.params

    t_step = timeit(lambda: sim.run(state, neigh, 1)[0].x)
    print(f"step        {t_step*1e3:8.2f} ms", flush=True)

    rows_f = jax.jit(lambda st: contact.particle_rows(st, shapes))
    t_rows = timeit(lambda: rows_f(state))
    print(f"rows        {t_rows*1e3:8.2f} ms", flush=True)

    @jax.jit
    def full(st, ng):
        return contact.contact_force_pairs(
            st, shapes, params, ng, exact=sim.exact_eval,
            periodic=sim.periodic, chunk=sim.pair_chunk,
            use_pallas=True, stage2_cap=stage2,
        )[0]

    t_full = timeit(lambda: full(state, neigh))
    print(f"forces      {t_full*1e3:8.2f} ms", flush=True)

    @jax.jit
    def full_nostage(st, ng):
        return contact.contact_force_pairs(
            st, shapes, params, ng, exact=sim.exact_eval,
            periodic=sim.periodic, chunk=sim.pair_chunk,
            use_pallas=True, stage2_cap=0,
        )[0]

    t_full0 = timeit(lambda: full_nostage(state, neigh))
    print(f"forces(1st) {t_full0*1e3:8.2f} ms  (no two-stage)", flush=True)

    # Pieces.
    rows = rows_f(state)
    pi, pj = neigh.pair_i, neigh.pair_j

    @jax.jit
    def pack(st, ng):
        rws = contact.particle_rows(st, shapes)
        ri, rj = rws[pi], rws[pj]
        msk = ng.pair_valid
        dp = contact.minimum_image(
            rj[:, contact._RX] - ri[:, contact._RX],
            st.box_lo, st.box_hi, sim.periodic,
        )
        return contact_pallas.pack_pairs(
            st, shapes, params, pi, pj, msk, ng.pair_hist, dp, rows=rws
        )

    packed, ci, cj, cap, par = pack(state, neigh)
    jax.block_until_ready(packed)
    t_pack = timeit(lambda: pack(state, neigh)[0])
    print(f"pack        {t_pack*1e3:8.2f} ms", flush=True)

    cap1 = jnp.stack([shapes.cap_x, shapes.cap_glw,
                      shapes.cap_cpsi, shapes.cap_spsi], axis=0)

    s1 = jax.jit(lambda pk, a, b: contact_pallas.stage1_depth_pallas(
        pk, a, b, cap1, lmax=shapes.lmax))
    t_s1 = timeit(lambda: s1(packed, ci, cj))
    depth = s1(packed, ci, cj)
    n_surv = int(jnp.sum(depth > -0.08 * float(jnp.min(shapes.rchar))))
    print(f"stage1      {t_s1*1e3:8.2f} ms  (survivors {n_surv}/{P})",
          flush=True)

    sel = jnp.arange(stage2, dtype=jnp.int32) % P

    @jax.jit
    def gather2(pk, a, b):
        return pk[sel], a[sel], b[sel]

    t_g2 = timeit(lambda: gather2(packed, ci, cj)[0])
    print(f"gather2     {t_g2*1e3:8.2f} ms  ({stage2} rows)", flush=True)

    pk2, ci2, cj2 = gather2(packed, ci, cj)

    s2 = jax.jit(lambda pk, a, b: contact_pallas.pair_contact_pallas(
        pk, a, b, cap, par, lmax=shapes.lmax))
    t_s2 = timeit(lambda: s2(pk2, ci2, cj2))
    print(f"stage2      {t_s2*1e3:8.2f} ms  ({stage2} pairs)", flush=True)

    t_ker = timeit(lambda: s2(packed, ci, cj))
    print(f"kernel-all  {t_ker*1e3:8.2f} ms  ({P} pairs)", flush=True)

    reb = jax.jit(lambda st, ng: sim._rebuild(st, ng)[1].idx)
    t_reb = timeit(lambda: reb(state, neigh), n=3)
    print(f"rebuild     {t_reb*1e3:8.2f} ms  (every {sim.rebuild_every})",
          flush=True)

    for blk in (64, 128, 256):
        try:
            s1b = jax.jit(lambda pk, a, b, _blk=blk:
                          contact_pallas.stage1_depth_pallas(
                              pk, a, b, cap1, lmax=shapes.lmax, block=_blk))
            t = timeit(lambda: s1b(packed, ci, cj))
            print(f"stage1 b{blk:<4d}{t*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"stage1 b{blk}: {type(e).__name__}", flush=True)
    # bf16 probe: does the VPU run the chain faster in bf16?
    try:
        pk16 = packed.astype(jnp.bfloat16)
        ci16, cj16 = ci.astype(jnp.bfloat16), cj.astype(jnp.bfloat16)
        cap16 = cap1.astype(jnp.bfloat16)
        s1h = jax.jit(lambda pk, a, b: contact_pallas.stage1_depth_pallas(
            pk, a, b, cap16, lmax=shapes.lmax, block=256))
        t = timeit(lambda: s1h(pk16, ci16, cj16))
        print(f"stage1 bf16 {t*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"stage1 bf16: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
