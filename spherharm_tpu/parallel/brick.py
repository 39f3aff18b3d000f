"""2D brick domain decomposition: x*y shard grid with two-phase halos.

Extends the 1D slab decomposition (halo.py) to a 2D brick over a mesh
("x", "y") — the reference's ``Comm::set_proc_grid`` factorizes ranks
into a 3D brick (SURVEY.md 2 B.6); two sharded axes already lift the
1D scaling cap (shards <= box_x / (cutoff+skin)) to the product of two
such caps, which covers every TPU pod slice size that matters.

The classic two-phase trick makes 2D exchange a composition of two 1D
exchanges (exactly how the reference's 6-way brick exchange covers all
26 neighbors):

  migrate:  move leavers one hop along x, THEN one hop along y —
            a diagonal migrant takes both phases within one rebuild.
  halo:     phase 1 ships x-face members of the OWNED set; phase 2
            computes y-face membership over owned + x-ghosts, so corner
            ghosts ride the second phase automatically.
  forward:  re-gather x-ghosts from owned, rebuild the extended view,
            re-gather y-ghosts from it (ordering matters).

Extended row layout per shard: [owned cap_local | x-ghosts 2*halo_cap |
y-ghosts 2*halo_cap]. Everything downstream (binning windows, pair
list, forces) is inherited from ShardedSimulation unchanged.

Not supported here (use the 1D slabs): triclinic tilt, weighted
per-axis balancing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spherharm_tpu.core.state import State, empty_neighbors
from spherharm_tpu.ops import contact, neighbor
from spherharm_tpu.parallel.halo import (
    COMM_FIELDS,
    GhostPack,
    ShardedSimulation,
    _init_jit,
    _select_fill,
    empty_ghosts,
)


class Brick2DSimulation(ShardedSimulation):
    """DEM sharded over a 2D ("x", "y") device mesh.

    Reuses ShardedSimulation's force/step/run machinery; overrides the
    geometry, migration and ghost exchange for two sharded dims.
    """

    def __init__(
        self,
        shapes,
        params,
        *,
        mesh: Mesh,
        box_lo,
        box_hi,
        cap_local: int,
        halo_cap: int,
        migrate_cap: int = 0,
        periodic=(True, True, True),
        k_max: int = 32,
        cell_cap: int = 8,
        pair_capacity: int = 0,
        pair_chunk: int = 16384,
        walls: tuple = (),
        exact_eval: bool | None = None,
        deform_min: float = 1.0,
        use_pallas: bool = False,
        rebuild_every: int = 0,
        wall_capacity: int = 0,
        stage2_capacity: int = 0,
    ):
        if mesh.devices.ndim != 2 or mesh.axis_names != ("x", "y"):
            raise ValueError(
                "Brick2DSimulation needs a 2D mesh with axes ('x', 'y')"
            )
        self.shapes = shapes
        self.params = params
        self.mesh = mesh
        self.px, self.py = mesh.devices.shape
        self.n_shards = self.px * self.py
        self._axes = ("x", "y")
        self.cap_local = int(cap_local)
        self.halo_cap = int(halo_cap)
        self.migrate_cap = int(migrate_cap) or max(halo_cap // 2, 16)
        self.periodic = tuple(bool(p) for p in periodic)
        self.k_max = int(k_max)
        self.cell_cap = int(cell_cap)
        self.pair_capacity = int(pair_capacity) or 8 * cap_local
        self.pair_chunk = int(pair_chunk)
        self.walls = tuple(walls)
        if exact_eval is None:
            exact_eval = jax.default_backend() in ("tpu", "axon")
        self.exact_eval = bool(exact_eval)
        self.use_pallas = bool(use_pallas)
        self.rebuild_every = int(rebuild_every)
        self.wall_capacity = int(wall_capacity)
        self.stage2_capacity = int(stage2_capacity)
        self.triclinic = False
        self.tilt_pad = 0.0
        self.conservative = False  # jnp-grad elastic mode: slabs only

        self.box_lo_np = np.asarray(box_lo, np.float64)
        self.box_hi_np = np.asarray(box_hi, np.float64)
        L = self.box_hi_np - self.box_lo_np
        cutoff_total = float(params.cutoff + params.skin)
        self.halo_depth = cutoff_total
        self.slab_w = (L[0] / self.px, L[1] / self.py)
        for d, (w, pn) in enumerate(zip(self.slab_w, (self.px, self.py))):
            if pn > 1 and w < self.halo_depth:
                raise ValueError(
                    f"axis {'xy'[d]}: brick width {w:.3g} < cutoff+skin "
                    f"{self.halo_depth:.3g}: too many shards"
                )
        # Static bin grid over the brick window + halo margins (z full).
        bin_ext = np.array([
            self.slab_w[0] + 2 * self.halo_depth,
            self.slab_w[1] + 2 * self.halo_depth,
            L[2],
        ])
        dims = np.maximum(
            np.floor(float(deform_min) * bin_ext / cutoff_total).astype(int),
            1,
        )
        self.grid_dims = tuple(int(v) for v in dims)
        # x/y images are explicit ghosts; only z min-images.
        self.periodic_eff = (False, False, self.periodic[2])

    # -- layout ------------------------------------------------------------

    @property
    def cap_ext(self) -> int:
        return self.cap_local + 4 * self.halo_cap

    def _is_sharded_leaf(self, leaf) -> bool:
        if leaf.ndim < 1 or leaf.shape[0] % self.n_shards != 0:
            return False
        per_dev = leaf.shape[0] // self.n_shards
        return per_dev in (
            self.cap_local, self.cap_ext, 2 * self.halo_cap,
            self.pair_capacity,
        )

    def _specs(self, tree):
        return jax.tree.map(
            lambda leaf: P(("x", "y")) if self._is_sharded_leaf(leaf)
            else P(), tree,
        )

    # -- axis-parameterized primitives --------------------------------------

    def _ax_size(self, axis: str) -> int:
        return self.px if axis == "x" else self.py

    def _ring(self, val, direction: str, axis: str):
        """ppermute one hop along one mesh axis."""
        n = self._ax_size(axis)
        if direction == "left":
            perm = [(i, (i - 1) % n) for i in range(n)]
        else:
            perm = [(i, (i + 1) % n) for i in range(n)]
        return jax.lax.ppermute(val, axis, perm)

    def _edges(self, state, axis: str):
        """(lo, hi) of this shard's window along the axis' coordinate."""
        dim = 0 if axis == "x" else 1
        idx = jax.lax.axis_index(axis)
        n = self._ax_size(axis)
        L = state.box_hi[dim] - state.box_lo[dim]
        w = L / n
        lo = state.box_lo[dim] + idx * w
        return lo, lo + w

    def _has_lo(self, axis: str):
        dim = 0 if axis == "x" else 1
        return self.periodic[dim] | (jax.lax.axis_index(axis) > 0)

    def _has_hi(self, axis: str):
        dim = 0 if axis == "x" else 1
        n = self._ax_size(axis)
        return self.periodic[dim] | (jax.lax.axis_index(axis) < n - 1)

    def _seam(self, axis: str, state):
        """Coordinate shift a SENT particle gets across the periodic seam."""
        dim = 0 if axis == "x" else 1
        idx = jax.lax.axis_index(axis)
        n = self._ax_size(axis)
        L = state.box_hi[dim] - state.box_lo[dim]
        lo_send = jnp.where(idx == 0, L, 0.0)
        hi_send = jnp.where(idx == n - 1, -L, 0.0)
        return (lo_send.astype(state.x.dtype), hi_send.astype(state.x.dtype))

    def _membership(self, coords, active, axis: str, state):
        """Halo senders along one axis: rows within halo_depth of a face."""
        lo, hi = self._edges(state, axis)
        near_l = active & (coords < lo + self.halo_depth) & self._has_lo(axis)
        near_r = active & (coords >= hi - self.halo_depth) & self._has_hi(axis)
        il, vl = _select_fill(near_l, self.halo_cap)
        ir, vr = _select_fill(near_r, self.halo_cap)
        send_idx = jnp.concatenate([il, ir])
        send_mask = jnp.concatenate([vl, vr])
        overflow = jnp.maximum(jnp.sum(near_l), jnp.sum(near_r))
        return send_idx, send_mask, overflow

    def _ship_fields(self, fields: dict, send_idx, send_mask, axis: str,
                     state):
        """Gather rows at send_idx, seam-shift the axis coordinate, and
        exchange both directions. Returns received field dict + active."""
        dim = 0 if axis == "x" else 1
        sl, sr = self._seam(axis, state)
        H = self.halo_cap
        out = {}
        for f, arr in fields.items():
            vals = arr[send_idx]
            if f == "x":
                vals = vals.at[:H, dim].add(sl).at[H:, dim].add(sr)
            from_right = self._ring(vals[:H], "left", axis)
            from_left = self._ring(vals[H:], "right", axis)
            out[f] = jnp.concatenate([from_left, from_right], axis=0)
        g_active = jnp.concatenate([
            self._ring(send_mask[H:], "right", axis),
            self._ring(send_mask[:H], "left", axis),
        ])
        return out, g_active

    # -- migration (two phases) ---------------------------------------------

    def _tgt_axis(self, state, axis: str):
        dim = 0 if axis == "x" else 1
        n = self._ax_size(axis)
        L = state.box_hi[dim] - state.box_lo[dim]
        f = (state.x[:, dim] - state.box_lo[dim]) / L
        return jnp.clip((f * n).astype(jnp.int32), 0, n - 1)

    def _migrate_axis(self, state, neigh, axis: str):
        """One 1D migration phase along a mesh axis (halo.py's _migrate
        with the axis generalized; history rows ride identically)."""
        idx = jax.lax.axis_index(axis)
        n = self._ax_size(axis)
        M = self.migrate_cap
        tgt = self._tgt_axis(state, axis)
        moving = state.active & (tgt != idx) & (n > 1)
        go_left = moving & (tgt == (idx - 1) % n) & self._has_lo(axis)
        go_right = (
            moving & (tgt == (idx + 1) % n) & self._has_hi(axis) & ~go_left
        )
        far = moving & ~go_left & ~go_right
        il, vl = _select_fill(go_left, M)
        ir, vr = _select_fill(go_right, M)
        mig_overflow = jnp.maximum(jnp.sum(go_left), jnp.sum(go_right))
        mig_overflow = jnp.where(
            jnp.any(far), jnp.int32(1 << 20), mig_overflow
        )

        hist_fields = {
            "ntag": neigh.neigh_tag, "nmask": neigh.mask,
            "nhist": neigh.hist, "whist": neigh.wall_hist,
        }
        bufs = {}
        for f in COMM_FIELDS:
            arr = getattr(state, f)
            bufs[f] = (arr[il], arr[ir])
        for f, arr in hist_fields.items():
            bufs[f] = (arr[il], arr[ir])
        fields = tuple(bufs.keys())
        from_right = {
            f: self._ring(bufs[f][0], "left", axis) for f in fields
        }
        from_left = {
            f: self._ring(bufs[f][1], "right", axis) for f in fields
        }
        recv_valid = jnp.concatenate([
            self._ring(vr, "right", axis), self._ring(vl, "left", axis)
        ])
        recv = {
            f: jnp.concatenate([from_left[f], from_right[f]], axis=0)
            for f in fields
        }

        active = state.active & ~(go_left | go_right)
        free_idx, free_ok = _select_fill(~active, 2 * M)
        place = recv_valid & free_ok
        slot = jnp.where(place, free_idx, self.cap_local)

        def scatter(field, val, sentinel=self.cap_local):
            pad = jnp.zeros((1,) + field.shape[1:], field.dtype)
            ext = jnp.concatenate([field, pad], axis=0)
            s = slot if sentinel == self.cap_local else jnp.where(
                place, free_idx, sentinel
            )
            return ext.at[s].set(val)[:-1]

        new_fields = {
            f: scatter(getattr(state, f), recv[f]) for f in COMM_FIELDS
        }
        act_ext = jnp.concatenate([active, jnp.zeros((1,), bool)])
        active = act_ext.at[slot].set(place)[:-1]
        state = state.replace(active=active, **new_fields)
        ext_rows = neigh.hist.shape[0]
        neigh = neigh.replace(
            neigh_tag=scatter(neigh.neigh_tag, recv["ntag"], ext_rows),
            mask=scatter(neigh.mask, recv["nmask"], ext_rows),
            hist=scatter(neigh.hist, recv["nhist"], ext_rows),
            wall_hist=scatter(neigh.wall_hist, recv["whist"], ext_rows),
            row_tag=scatter(neigh.row_tag, recv["tag"], ext_rows),
        )
        return state, neigh, mig_overflow

    def _migrate(self, state, neigh):
        state, neigh, ovf_x = self._migrate_axis(state, neigh, "x")
        state, neigh, ovf_y = self._migrate_axis(state, neigh, "y")
        return state, neigh, jnp.maximum(ovf_x, ovf_y)

    # -- extended view -------------------------------------------------------

    def _extend(self, state: State, ghosts):
        """owned + x-ghosts + y-ghosts into one extended State view."""
        gx, gy = ghosts
        n_g = 4 * self.halo_cap
        z3 = jnp.zeros((n_g, 3), state.x.dtype)

        def cat(f):
            return jnp.concatenate(
                [getattr(state, f), getattr(gx, f), getattr(gy, f)]
            )

        return state.replace(
            x=cat("x"), v=cat("v"), q=cat("q"), angmom=cat("angmom"),
            scale=cat("scale"), shtype=cat("shtype"), tag=cat("tag"),
            active=cat("active"),
            f=jnp.concatenate([state.f, z3]),
            tau=jnp.concatenate([state.tau, z3]),
            image=jnp.concatenate(
                [state.image, jnp.zeros((n_g, 3), jnp.int32)]
            ),
        )

    def _owned_mask(self, dtype=bool):
        return jnp.concatenate([
            jnp.ones((self.cap_local,), bool),
            jnp.zeros((4 * self.halo_cap,), bool),
        ])

    # -- halo build / refresh ------------------------------------------------

    def _build_ghosts(self, state: State):
        """Two-phase halo: x-faces of owned, then y-faces of owned+gx."""
        send_f = ("x", "v", "q", "angmom", "scale", "shtype", "tag")
        # Phase 1: x.
        sx_idx, sx_mask, ovf_x = self._membership(
            state.x[:, 0], state.active, "x", state
        )
        fx = {f: getattr(state, f) for f in send_f}
        rx, ax = self._ship_fields(
            {f: fx[f][..., :] for f in send_f}, sx_idx, sx_mask, "x", state
        )
        gx = GhostPack(
            x=rx["x"], v=rx["v"], q=rx["q"], angmom=rx["angmom"],
            scale=rx["scale"], shtype=rx["shtype"], tag=rx["tag"],
            active=ax, send_idx=sx_idx, send_mask=sx_mask,
        )
        # Phase 2: y over owned + x-ghosts (corners ride along).
        exy = {
            f: jnp.concatenate([getattr(state, f), getattr(gx, f)])
            for f in send_f
        }
        act_xy = jnp.concatenate([state.active, gx.active])
        sy_idx, sy_mask, ovf_y = self._membership(
            exy["x"][:, 1], act_xy, "y", state
        )
        ry, ay = self._ship_fields(exy, sy_idx, sy_mask, "y", state)
        gy = GhostPack(
            x=ry["x"], v=ry["v"], q=ry["q"], angmom=ry["angmom"],
            scale=ry["scale"], shtype=ry["shtype"], tag=ry["tag"],
            active=ay, send_idx=sy_idx, send_mask=sy_mask,
        )
        return (gx, gy), jnp.maximum(ovf_x, ovf_y)

    def _forward_comm(self, state: State, neigh, ghosts):
        """Per-step ghost refresh: x phase from owned, y phase from the
        refreshed owned+x view (same routing as the last rebuild)."""
        gx, gy = ghosts
        dyn = ("x", "v", "q", "angmom")
        rx, _ = self._ship_fields(
            {f: getattr(state, f) for f in dyn},
            gx.send_idx, gx.send_mask, "x", state,
        )
        gx = gx.replace(x=rx["x"], v=rx["v"], q=rx["q"], angmom=rx["angmom"])
        exy = {
            f: jnp.concatenate([getattr(state, f), getattr(gx, f)])
            for f in dyn
        }
        ry, _ = self._ship_fields(exy, gy.send_idx, gy.send_mask, "y", state)
        gy = gy.replace(x=ry["x"], v=ry["v"], q=ry["q"], angmom=ry["angmom"])
        return state, neigh, (gx, gy)

    def _rebuild(self, state: State, neigh, ghosts, fold: bool = True):
        x, image = neighbor.wrap_positions(
            state.x, state.image, state.box_lo, state.box_hi, self.periodic,
        )
        state = state.replace(x=x, image=image)
        if fold:
            neigh = neigh.replace(hist=contact.pair_hist_to_dense(neigh))
        state, neigh, mig_ovf = self._migrate(state, neigh)

        ghosts, halo_ovf = self._build_ghosts(state)
        ext = self._extend(state, ghosts)

        x_lo, x_hi = self._edges(state, "x")
        y_lo, y_hi = self._edges(state, "y")
        bin_lo = jnp.stack([
            x_lo - self.halo_depth, y_lo - self.halo_depth, state.box_lo[2]
        ])
        bin_hi = jnp.stack([
            x_hi + self.halo_depth, y_hi + self.halo_depth, state.box_hi[2]
        ])
        cutoff = self.params.cutoff + self.params.skin
        owned = self._owned_mask()
        nidx, nmask, count, cell_ovf = neighbor.cell_list_neighbors(
            ext.x, ext.active, state.box_lo, state.box_hi, cutoff,
            self.grid_dims, self.cell_cap, self.k_max, self.periodic_eff,
            bin_lo=bin_lo, bin_hi=bin_hi, owned=owned & ext.active,
        )
        neigh_tag = jnp.where(nmask, ext.tag[nidx], 0)
        row_ok = neigh.row_tag == ext.tag
        hist = neighbor.remap_history(
            neigh_tag, nmask, neigh.neigh_tag, neigh.mask, neigh.hist, row_ok
        )
        pair_fields, n_pairs = contact.build_pair_list(
            ext, self.shapes, self.params, nidx, nmask, hist,
            owned & ext.active, self.pair_capacity, self.periodic_eff,
        )
        # Per-source gating (see ShardedSimulation._rebuild): nonzero
        # overflow always means some capacity was actually exceeded.
        mx = jnp.max(count)
        overflow = jnp.maximum(
            jnp.maximum(jnp.where(mx > self.k_max, mx, 0),
                        jnp.where(cell_ovf > self.cell_cap, cell_ovf, 0)),
            jnp.maximum(
                jnp.where(mig_ovf > self.migrate_cap, mig_ovf, 0),
                jnp.where(halo_ovf > self.halo_cap, halo_ovf, 0),
            ),
        )
        overflow = jnp.maximum(
            overflow, jnp.where(n_pairs > self.pair_capacity, n_pairs, 0)
        )
        overflow = jax.lax.pmax(overflow, self._axes)
        neigh = neigh.replace(
            idx=nidx, mask=nmask, hist=hist, neigh_tag=neigh_tag,
            row_tag=ext.tag, x_build=ext.x,
            overflow=jnp.maximum(neigh.overflow, overflow),
            **pair_fields,
        )
        return state, neigh, ghosts

    # -- distribution --------------------------------------------------------

    def distribute(self, state_global: State, restart: dict | None = None):
        """Partition a global State into (ix, iy) brick blocks."""
        if bool(np.any(np.asarray(state_global.tilt) != 0.0)):
            raise ValueError(
                "Brick2DSimulation does not support triclinic tilt — "
                "use the 1D slab ShardedSimulation(triclinic=True)"
            )
        P_ = self.n_shards
        x = np.asarray(state_global.x)
        active = np.asarray(state_global.active)
        L = self.box_hi_np - self.box_lo_np
        bx = np.clip(
            ((x[:, 0] - self.box_lo_np[0]) / L[0] * self.px).astype(int),
            0, self.px - 1,
        )
        by = np.clip(
            ((x[:, 1] - self.box_lo_np[1]) / L[1] * self.py).astype(int),
            0, self.py - 1,
        )
        block = bx * self.py + by
        locals_ = []
        sels = []
        for p in range(P_):
            sel = np.flatnonzero(active & (block == p))
            if sel.size > self.cap_local:
                raise ValueError(
                    f"brick {p} holds {sel.size} > cap_local={self.cap_local}"
                )
            sels.append(sel)
            pad = self.cap_local - sel.size
            rows = {}
            for f in COMM_FIELDS + ("active",):
                v = np.asarray(getattr(state_global, f))[sel]
                v = np.concatenate(
                    [v, np.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
                )
                rows[f] = v
            rows["active"][sel.size:] = False
            rows["q"][sel.size:, 0] = 1.0
            rows["scale"][sel.size:] = 1.0
            locals_.append(rows)

        def cat(f):
            return jnp.asarray(np.concatenate([loc[f] for loc in locals_]))

        dtype = state_global.x.dtype
        st = State(
            x=cat("x").astype(dtype), v=cat("v").astype(dtype),
            q=cat("q").astype(dtype), angmom=cat("angmom").astype(dtype),
            f=jnp.zeros((P_ * self.cap_local, 3), dtype),
            tau=jnp.zeros((P_ * self.cap_local, 3), dtype),
            scale=cat("scale").astype(dtype), shtype=cat("shtype"),
            tag=cat("tag"), active=cat("active"), image=cat("image"),
            box_lo=state_global.box_lo, box_hi=state_global.box_hi,
            tilt=state_global.tilt, step=state_global.step,
        )
        neigh = empty_neighbors(
            P_ * self.cap_ext, self.k_max, len(self.walls), dtype=dtype,
            pair_cap=P_ * self.pair_capacity,
        )
        if restart is not None:
            ce, K = self.cap_ext, self.k_max
            hw = neigh.hist.shape[-1]
            W = neigh.wall_hist.shape[1]
            nt = np.zeros((P_ * ce, K), np.int32)
            nh = np.zeros((P_ * ce, K, hw), np.float32)
            wh = np.zeros((P_ * ce, W, hw), np.float32)
            rt = np.zeros((P_ * ce,), np.int32)
            tags_g = np.asarray(state_global.tag)
            for p, sel in enumerate(sels):
                rows = slice(p * ce, p * ce + sel.size)
                nt[rows] = np.asarray(restart["hist_tags"])[sel]
                nh[rows] = np.asarray(restart["hist"])[sel]
                if W:
                    wh[rows] = np.asarray(restart["wall_hist"])[sel]
                rt[rows] = tags_g[sel]
            neigh = neigh.replace(
                neigh_tag=jnp.asarray(nt),
                hist=jnp.asarray(nh, neigh.hist.dtype),
                wall_hist=jnp.asarray(wh, neigh.wall_hist.dtype),
                row_tag=jnp.asarray(rt),
                mask=jnp.asarray(nt > 0),
            )
        ghosts = tuple(
            jax.tree.map(
                lambda a: jnp.concatenate([a] * P_, axis=0),
                empty_ghosts(self.halo_cap, dtype),
            )
            for _ in range(2)
        )
        sharding = NamedSharding(self.mesh, P(("x", "y")))

        def put(leaf):
            if self._is_sharded_leaf(leaf):
                return jax.device_put(leaf, sharding)
            return jax.device_put(leaf, NamedSharding(self.mesh, P()))

        st = jax.tree.map(put, st)
        neigh = jax.tree.map(put, neigh)
        ghosts = jax.tree.map(put, ghosts)
        return st, neigh, ghosts
