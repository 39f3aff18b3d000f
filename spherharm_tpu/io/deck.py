"""LAMMPS input-deck translator — the command subset the five acceptance
configs need (SURVEY.md section 5.6: "a deck translator mapping the
command subset used by the five configs 1:1 onto the API"; contract
BASELINE.json:5 "reference input decks can be translated 1:1").

Supported commands (LAMMPS syntax; unknown commands raise):

  units lj|si|metal            # recorded; unit systems are caller-defined
  dimension 3
  boundary {p|f} {p|f} {p|f}
  atom_style spherharm
  region <id> block xlo xhi ylo yhi zlo zhi
  create_box <ntypes> <region-id>
  shape <type> <coeff-file>            # SPHERHARM coefficient table
  shape <type> sphere <R> | ellipsoid <a> <b> <c> | blob <seed> [rough]
  density <type> <rho>
  read_data <file>
  lattice sc <pitch>
  create_atoms <type> random <N> <seed> <region-id> [scale <lo> <hi>]
  create_atoms <type> region <region-id> [seed <s>] [scale <lo> <hi>]
  velocity all create <KE-per-atom> <seed> | velocity all set vx vy vz
  pair_style spherharm <kn> <kt> <gamma_n> <gamma_t> <mu> [lmax <L>]
  pair_coeff * *
  neighbor <skin> bin
  neigh_modify every <N> check {yes|no}
  fix <id> all nve/sh
  fix <id> all gravity <g> vector <x> <y> <z>
  fix <id> all wall/gran plane <px> <py> <pz> <nx> <ny> <nz>
  fix <id> all wall/gran cylinder <ax> <ay> <az> <dx> <dy> <dz> <R> <omega>
  fix <id> all deform <rate_x> <rate_y> <rate_z>
  fix <id> all press/berendsen <target> <tau>
  timestep <dt>
  thermo <every>
  dump <id> all custom <every> <file> [cols...]
  run <N>
  variable / loop / if     # NOT supported (out of scope, raise)

The executor builds Shapes/SimParams/State, constructs a Simulation and
runs it, producing thermo rows and dump files exactly where a LAMMPS run
would.
"""

from __future__ import annotations

import shlex

import numpy as np
import jax.numpy as jnp

from spherharm_tpu.core.simulation import Simulation
from spherharm_tpu.core.state import SimParams
from spherharm_tpu.io import data as data_io
from spherharm_tpu.io.dump import write_dump
from spherharm_tpu.io.thermo_log import ThermoLog
from spherharm_tpu.models import scenarios, shapes_library
from spherharm_tpu.ops.neighbor import CellGrid
from spherharm_tpu.ops.walls import CylinderWall, PlaneWall


class DeckError(ValueError):
    pass


class DeckRunner:
    """Parses and executes a LAMMPS-style input deck."""

    def __init__(self, echo=False, k_max=32, cell_cap=12):
        self.echo = echo
        self.k_max = k_max
        self.cell_cap = cell_cap
        # deck state
        self.units = "lj"
        self.periodic = (False, False, False)
        self.regions = {}
        self.box = None              # (lo, hi)
        self.n_types = 1
        self.shape_specs = {}        # type(0-based) -> np coeffs
        self.density = {}
        self.lmax = None
        self.pair = None             # dict kn/kt/gn/gt/mu
        self.skin = None
        self.dt = 1e-4
        self.gravity = (0.0, 0.0, 0.0)
        self.deform_rate = (0.0, 0.0, 0.0)
        self.press_target = 0.0
        self.press_tau = 0.0
        self.rebuild_every = 0
        self.walls = []
        self.fixes = []
        self.thermo_every = 0
        self.dumps = []              # (every, path, cols)
        self.atoms = None            # dict of arrays
        self.rng = np.random.default_rng(12345)
        # runtime
        self.sim = None
        self.state = None
        self.neigh = None
        self.thermo_log = ThermoLog(echo=echo)
        self.total_steps = 0

    # ------------------------------------------------------------------

    def run_file(self, path):
        with open(path) as f:
            self.run_text(f.read())
        return self

    def run_text(self, text):
        for raw in text.splitlines():
            line = raw.split("#")[0].strip()
            if not line:
                continue
            self.execute(line)
        return self

    def execute(self, line):
        toks = shlex.split(line)
        cmd, args = toks[0], toks[1:]
        handler = getattr(self, f"cmd_{cmd}", None)
        if handler is None:
            raise DeckError(f"unsupported deck command: {cmd!r}")
        handler(args)

    # -- setup commands --------------------------------------------------

    def cmd_units(self, a):
        self.units = a[0]

    def cmd_dimension(self, a):
        if a[0] != "3":
            raise DeckError("only 3D is supported")

    def cmd_boundary(self, a):
        self.periodic = tuple(tok.startswith("p") for tok in a[:3])

    def cmd_atom_style(self, a):
        if a[0] not in ("spherharm", "sphere"):
            raise DeckError(f"unsupported atom_style {a[0]}")

    def cmd_region(self, a):
        rid, kind = a[0], a[1]
        if kind != "block":
            raise DeckError("only block regions supported")
        v = [float(t) for t in a[2:8]]
        self.regions[rid] = (np.array(v[0::2]), np.array(v[1::2]))

    def cmd_create_box(self, a):
        self.n_types = int(a[0])
        self.box = self.regions[a[1]]

    def cmd_shape(self, a):
        t = int(a[0]) - 1
        if a[1] == "sphere":
            spec = ("sphere", float(a[2]))
        elif a[1] == "ellipsoid":
            spec = ("ellipsoid", float(a[2]), float(a[3]), float(a[4]))
        elif a[1] == "blob":
            spec = ("blob", int(a[2]), float(a[3]) if len(a) > 3 else 0.15)
        else:
            spec = ("file", a[1])
        self.shape_specs[t] = spec

    def cmd_density(self, a):
        self.density[int(a[0]) - 1] = float(a[1])

    def cmd_read_data(self, a):
        self.atoms = data_io.read_data_file(a[0])
        self.box = (self.atoms["box_lo"], self.atoms["box_hi"])

    def cmd_lattice(self, a):
        if a[0] != "sc":
            raise DeckError("only simple-cubic lattice supported")
        self.lattice_pitch = float(a[1])

    def cmd_create_atoms(self, a):
        t = int(a[0]) - 1
        seed = 12345
        if "seed" in a:
            seed = int(a[a.index("seed") + 1])
        rng = np.random.default_rng(seed)
        if a[1] == "random":
            n, seed, rid = int(a[2]), int(a[3]), a[4]
            rng = np.random.default_rng(seed)
            lo, hi = self.regions[rid]
            x = rng.uniform(lo, hi, (n, 3))
        elif a[1] == "region":
            # Fill the region with simple-cubic lattice sites (the
            # LAMMPS lattice + create_atoms region idiom).
            pitch = getattr(self, "lattice_pitch", None)
            if pitch is None:
                raise DeckError("create_atoms region requires a lattice")
            lo, hi = self.regions[a[2]]
            axes = [np.arange(lo[d] + pitch / 2, hi[d], pitch) for d in range(3)]
            gx, gy, gz = np.meshgrid(*axes, indexing="ij")
            x = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)
            n = x.shape[0]
            x = x + rng.uniform(-0.02, 0.02, x.shape) * pitch
        else:
            raise DeckError(
                "create_atoms supports 'T random N seed region' or "
                "'T region <id>'"
            )
        scale = np.ones(n)
        if "scale" in a:
            i = a.index("scale")
            scale = rng.uniform(float(a[i + 1]), float(a[i + 2]), n)
        q = rng.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        new = {
            "x": x, "q": q, "scale": scale,
            "shtype": np.full(n, t, np.int32),
        }
        if self.atoms is None:
            self.atoms = new
            self.atoms["tag"] = np.arange(1, n + 1, dtype=np.int32)
        else:
            base = int(self.atoms["tag"].max())
            new["tag"] = np.arange(base + 1, base + n + 1, dtype=np.int32)
            for k in ("x", "q", "scale", "shtype", "tag"):
                self.atoms[k] = np.concatenate([self.atoms[k], new[k]])

    def cmd_velocity(self, a):
        if self.atoms is None:
            raise DeckError("velocity before atoms exist")
        n = self.atoms["x"].shape[0]
        if a[1] == "set":
            self.atoms["v"] = np.tile(
                [float(a[2]), float(a[3]), float(a[4])], (n, 1)
            )
        elif a[1] == "create":
            rng = np.random.default_rng(int(a[3]))
            v = rng.normal(size=(n, 3))
            v *= np.sqrt(float(a[2]) / np.mean(np.sum(v**2, -1)))
            self.atoms["v"] = v
        else:
            raise DeckError(f"velocity mode {a[1]} unsupported")

    def cmd_pair_style(self, a):
        if a[0] not in ("spherharm", "sh", "gran/hertz/history"):
            raise DeckError(f"unsupported pair_style {a[0]}")
        self.pair = {
            "kn": float(a[1]), "kt": float(a[2]),
            "gamma_n": float(a[3]), "gamma_t": float(a[4]),
            "mu": float(a[5]),
        }
        if "lmax" in a:
            self.lmax = int(a[a.index("lmax") + 1])

    def cmd_pair_coeff(self, a):
        pass  # per-type data comes from `shape` commands

    def cmd_neighbor(self, a):
        self.skin = float(a[0])

    def cmd_neigh_modify(self, a):
        # "every N check no" -> static cadence; "check yes" -> triggered.
        every = 0
        if "every" in a:
            every = int(a[a.index("every") + 1])
        if "check" in a and a[a.index("check") + 1] == "yes":
            every = 0
        self.rebuild_every = every

    def cmd_fix(self, a):
        style = a[2]
        if style in ("nve/sh", "nve/spherharm", "nve"):
            self.fixes.append("nve")
        elif style == "gravity":
            g = float(a[3])
            assert a[4] == "vector"
            d = np.array([float(a[5]), float(a[6]), float(a[7])])
            d = d / np.linalg.norm(d)
            self.gravity = tuple(g * d)
        elif style == "wall/gran":
            if a[3] == "plane":
                self.walls.append(PlaneWall.create(
                    [float(v) for v in a[4:7]], [float(v) for v in a[7:10]]
                ))
            elif a[3] == "cylinder":
                self.walls.append(CylinderWall.create(
                    [float(v) for v in a[4:7]], [float(v) for v in a[7:10]],
                    float(a[10]), float(a[11]) if len(a) > 11 else 0.0,
                ))
            else:
                raise DeckError(f"wall kind {a[3]} unsupported")
        elif style == "deform":
            self.deform_rate = tuple(float(v) for v in a[3:6])
        elif style == "press/berendsen":
            self.press_target = float(a[3])
            self.press_tau = float(a[4])
        else:
            raise DeckError(f"unsupported fix style {style}")

    def cmd_timestep(self, a):
        self.dt = float(a[0])

    def cmd_thermo(self, a):
        self.thermo_every = int(a[0])

    def cmd_dump(self, a):
        every, path = int(a[3]), a[4]
        cols = tuple(a[5:]) or None
        self.dumps.append([every, path, cols, False])

    # -- run --------------------------------------------------------------

    def _build_shapes(self):
        if self.lmax is None:
            self.lmax = 8 if any(
                s[0] in ("file", "blob") for s in self.shape_specs.values()
            ) else 4
        coeffs = []
        for t in range(max(self.shape_specs.keys(), default=-1) + 1):
            spec = self.shape_specs.get(t, ("sphere", 0.5))
            if spec[0] == "sphere":
                c = shapes_library.sphere_coeffs(spec[1], self.lmax)
            elif spec[0] == "ellipsoid":
                c = shapes_library.ellipsoid_coeffs(*spec[1:4], self.lmax)
            elif spec[0] == "blob":
                c = shapes_library.blob_coeffs(
                    self.lmax, seed=spec[1], roughness=spec[2]
                )
            else:
                c, file_lmax = data_io.read_coeff_file(spec[1])
                if file_lmax != self.lmax:
                    cc = np.zeros((self.lmax + 1) ** 2)
                    ncopy = min(len(c), len(cc))
                    cc[:ncopy] = c[:ncopy]
                    c = cc
            coeffs.append(c)
        dens = np.array([self.density.get(t, 1.0) for t in range(len(coeffs))])
        # Low-order surfaces get a denser cap grid: quadrature noise in the
        # overlap integrals, not basis truncation, limits their accuracy.
        cq = (12, 24) if self.lmax <= 2 else None
        return shapes_library.build_shapes(
            np.stack(coeffs), self.lmax, dens, contact_quad=cq
        )

    def _materialize(self):
        if self.sim is not None:
            return
        if self.pair is None or self.atoms is None or self.box is None:
            raise DeckError("deck must define box, atoms and pair_style before run")
        shapes = self._build_shapes()
        rmax = float(np.max(np.asarray(shapes.rmax)))
        scale_max = float(np.max(self.atoms["scale"]))
        cutoff = 2.0 * rmax * scale_max
        skin = self.skin if self.skin is not None else 0.3 * rmax
        params = SimParams.create(
            dt=self.dt, kn=self.pair["kn"], kt=self.pair["kt"],
            gamma_n=self.pair["gamma_n"], gamma_t=self.pair["gamma_t"],
            mu=self.pair["mu"], gravity=self.gravity,
            skin=skin, cutoff=cutoff,
            deform_rate=self.deform_rate,
            press_target=(self.press_target,) * 3, press_tau=self.press_tau,
        )
        lo, hi = self.box
        state = scenarios.make_state(
            self.atoms["x"], lo, hi,
            v=self.atoms.get("v"), q=self.atoms.get("q"),
            angmom=self.atoms.get("angmom"),
            scale=self.atoms.get("scale"), shtype=self.atoms.get("shtype"),
        )
        if "tag" in self.atoms:
            state = state.replace(
                tag=state.tag.at[: len(self.atoms["tag"])].set(
                    jnp.asarray(self.atoms["tag"], jnp.int32))
            )
        n = self.atoms["x"].shape[0]
        grid = CellGrid(lo, hi, cutoff + skin, self.periodic)
        self.sim = Simulation(
            shapes, params, periodic=self.periodic, neighbor_mode="cell",
            grid=grid, k_max=self.k_max, cell_cap=self.cell_cap,
            walls=tuple(self.walls),
            pair_capacity=max(4 * n, 512),
            press_control=self.press_tau > 0,
            rebuild_every=self.rebuild_every,
        )
        self.state, self.neigh = self.sim.init_neighbors(state)

    def _outputs(self):
        step = int(self.state.step)
        if self.thermo_every and step % self.thermo_every == 0:
            self.thermo_log.log(self.sim.thermo(self.state, self.neigh))
        for d in self.dumps:
            every, path, cols, started = d
            if every and step % every == 0:
                kw = {"columns": cols} if cols else {}
                write_dump(path, self.state, self.sim.shapes,
                           periodic=self.periodic, append=started, **kw)
                d[3] = True

    def cmd_run(self, a):
        n = int(a[0])
        self._materialize()
        cadences = [self.thermo_every] + [d[0] for d in self.dumps]
        cadences = [c for c in cadences if c > 0]
        self._outputs()
        done = 0
        while done < n:
            # Advance to the nearest step any output is scheduled at, so
            # non-commensurate cadences (thermo 100 + dump 30) each fire
            # on their own multiples, as LAMMPS does — not only at common
            # multiples.
            step = int(self.state.step)
            if cadences:
                todo = min(c - step % c for c in cadences)
            else:
                todo = n - done
            todo = min(todo, n - done)
            self.state, self.neigh = self.sim.run(self.state, self.neigh, todo)
            done += todo
            self._outputs()
        self.total_steps += n
