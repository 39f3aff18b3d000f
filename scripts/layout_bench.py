"""Kernel-layout microbench: power-basis SH eval layouts on real TPU.

Compares [B, G]-plane vs transposed Horner layouts for the power-basis
radius/gradient chain (ops/sh_power.py) in isolation from the full
contact kernel — the experiment that chose the current layout. Run on
TPU only; takes ~a minute.
"""

import sys
import time

sys.path.insert(0, ".")

from functools import partial  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from spherharm_tpu.models import shapes_library  # noqa: E402
from spherharm_tpu.ops import sh_power  # noqa: E402
from spherharm_tpu.ops.contact_pallas import _radius_grad_power  # noqa: E402

lmax = 8
lay = sh_power.power_layout(lmax)
runs, W = lay["runs"], lay["W"]
G = 128

def horner_T(tbl, off, n, ct):
    acc = tbl[off:off+1, :]
    for k in range(1, n):
        acc = acc * ct + tbl[off+k:off+k+1, :]
    return acc

def radius_grad_power_T(tbl, cos_t, sin_t, cos_p, sin_p, lmax):
    A = {m: horner_T(tbl, off, n, cos_t) for m, off, n in runs["A"]}
    B = {m: horner_T(tbl, off, n, cos_t) for m, off, n in runs["B"]}
    At = {m: horner_T(tbl, off, n, cos_t) for m, off, n in runs["At"]}
    Bt = {m: horner_T(tbl, off, n, cos_t) for m, off, n in runs["Bt"]}
    r = A[0] + jnp.zeros_like(cos_t)
    drt = sin_t * At[0]
    drp = jnp.zeros_like(cos_t)
    cos_m, sin_m = cos_p, sin_p
    st_m1 = 1.0
    for m in range(1, lmax + 1):
        if m > 1:
            cos_m, sin_m = (cos_m*cos_p - sin_m*sin_p, sin_m*cos_p + cos_m*sin_p)
        st_m = st_m1 * sin_t
        r = r + st_m * (cos_m * A[m] + sin_m * B[m])
        drt = drt + st_m1 * (cos_m * At[m] + sin_m * Bt[m])
        drp = drp + m * st_m * (cos_m * B[m] - sin_m * A[m])
        st_m1 = st_m
    return r, drt, drp

def kernel_T(tbl_ref, ct_ref, st_ref, cp_ref, sp_ref, out_ref):
    r, drt, drp = radius_grad_power_T(tbl_ref[:, :], ct_ref[:, :], st_ref[:, :], cp_ref[:, :], sp_ref[:, :], lmax)
    out_ref[0:1, :] = jnp.sum(r, axis=0, keepdims=True)
    out_ref[1:2, :] = jnp.sum(drt, axis=0, keepdims=True)
    out_ref[2:3, :] = jnp.sum(drp, axis=0, keepdims=True)
    out_ref[3:8, :] = jnp.zeros_like(out_ref[3:8, :])

def kernel_N(tbl_ref, ct_ref, st_ref, cp_ref, sp_ref, out_ref):
    r, drt, drp = _radius_grad_power(tbl_ref[:, :], ct_ref[:, :], st_ref[:, :], cp_ref[:, :], sp_ref[:, :], lmax)
    out_ref[:, 0:1] = jnp.sum(r, axis=1, keepdims=True)
    out_ref[:, 1:2] = jnp.sum(drt, axis=1, keepdims=True)
    out_ref[:, 2:3] = jnp.sum(drp, axis=1, keepdims=True)
    out_ref[:, 3:8] = jnp.zeros_like(out_ref[:, 3:8])

P = 65536
rng = np.random.default_rng(0)
c = shapes_library.blob_coeffs(lmax, seed=0, mean_radius=0.5, roughness=0.12)
tbl_row = sh_power.build_power_tables_np(c, lmax)[0].astype(np.float32)
theta = rng.uniform(0.05, np.pi-0.05, (P, G)).astype(np.float32)
phi = rng.uniform(0, 2*np.pi, (P, G)).astype(np.float32)
ct, st = np.cos(theta), np.sin(theta)
cp, sp = np.cos(phi), np.sin(phi)
tblN = jnp.asarray(np.broadcast_to(tbl_row, (P, W)) * rng.uniform(0.9, 1.1, (P,1)).astype(np.float32))
tblT = jnp.asarray(np.asarray(tblN).T.copy())
ctT, stT, cpT, spT = (jnp.asarray(a.T.copy()) for a in (ct, st, cp, sp))
ctN, stN, cpN, spN = (jnp.asarray(a) for a in (ct, st, cp, sp))

@partial(jax.jit, static_argnames=("block",))
def runT(tbl, ct, st, cp, sp, block=256):
    nb = P // block
    return pl.pallas_call(
        kernel_T,
        out_shape=jax.ShapeDtypeStruct((8, P), jnp.float32),
        grid=(nb,),
        in_specs=[pl.BlockSpec((W, block), lambda i: (0, i), memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec((G, block), lambda i: (0, i), memory_space=pltpu.VMEM)]*4,
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(tbl, ct, st, cp, sp)

@partial(jax.jit, static_argnames=("block",))
def runN(tbl, ct, st, cp, sp, block=64):
    nb = P // block
    return pl.pallas_call(
        kernel_N,
        out_shape=jax.ShapeDtypeStruct((P, 8), jnp.float32),
        grid=(nb,),
        in_specs=[pl.BlockSpec((block, W), lambda i: (i, 0), memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec((block, G), lambda i: (i, 0), memory_space=pltpu.VMEM)]*4,
        out_specs=pl.BlockSpec((block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(tbl, ct, st, cp, sp)

def bench(name, fn):
    t0 = time.time(); out = jax.block_until_ready(fn()); comp = time.time()-t0
    n = 30
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn())
    dt = (time.time()-t0)/n
    print(f"{name}: compile {comp:.1f}s run {dt*1000:.3f} ms -> {P*G/dt/1e9:.2f} Gnode-evals/s", flush=True)

bench("T256", lambda: runT(tblT, ctT, stT, cpT, spT, block=256))
bench("T512", lambda: runT(tblT, ctT, stT, cpT, spT, block=512))
bench("N64", lambda: runN(tblN, ctN, stN, cpN, spN, block=64))
bench("N256", lambda: runN(tblN, ctN, stN, cpN, spN, block=256))
oT = np.asarray(runT(tblT, ctT, stT, cpT, spT))
oN = np.asarray(runN(tblN, ctN, stN, cpN, spN))
print("parity:", np.abs(oT[0] - oN[:,0]).max() / np.abs(oN[:,0]).max())
