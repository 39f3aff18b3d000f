"""LAMMPS ``dump custom``-format trajectory writer.

Matches the reference's Dump layer output (SURVEY.md section 2 B.7 /
5.5: "dump writer emitting LAMMPS dump custom text format so existing
tooling (OVITO) reads it"; contract BASELINE.json:5 "LAMMPS dump/thermo
outputs are matched"). Text format:

    ITEM: TIMESTEP
    <step>
    ITEM: NUMBER OF ATOMS
    <n>
    ITEM: BOX BOUNDS pp pp ff
    <xlo> <xhi>
    ...
    ITEM: ATOMS id type x y z ...
    <rows sorted by id>
"""

from __future__ import annotations

import numpy as np

DEFAULT_COLUMNS = (
    "id", "type", "x", "y", "z", "vx", "vy", "vz",
    "quatw", "quati", "quatj", "quatk",
    "angmomx", "angmomy", "angmomz", "radius",
)


def _column_data(state, shapes, columns, extra=None):
    """Assemble per-particle columns (host-side numpy).

    ``extra``: dict of additional [cap]-sized per-particle arrays (e.g.
    per-atom compute values referenced as ``c_<id>`` dump columns).
    """
    act = np.asarray(state.active)
    sel = np.flatnonzero(act)
    x = np.asarray(state.x)[sel]
    v = np.asarray(state.v)[sel]
    q = np.asarray(state.q)[sel]
    L = np.asarray(state.angmom)[sel]
    tag = np.asarray(state.tag)[sel]
    typ = np.asarray(state.shtype)[sel] + 1  # LAMMPS types are 1-based
    scale = np.asarray(state.scale)[sel]
    rchar = np.asarray(shapes.rchar)[np.asarray(state.shtype)[sel]]
    pools = {
        "id": tag, "type": typ,
        "x": x[:, 0], "y": x[:, 1], "z": x[:, 2],
        "vx": v[:, 0], "vy": v[:, 1], "vz": v[:, 2],
        "quatw": q[:, 0], "quati": q[:, 1], "quatj": q[:, 2], "quatk": q[:, 3],
        "angmomx": L[:, 0], "angmomy": L[:, 1], "angmomz": L[:, 2],
        "radius": rchar * scale,
        "scale": scale,
    }
    for name, arr in (extra or {}).items():
        pools[name] = np.asarray(arr)[sel]
    order = np.argsort(tag)
    return {c: pools[c][order] for c in columns}


def write_dump(path, state, shapes, periodic=(False, False, False),
               columns=DEFAULT_COLUMNS, append=False, extra=None):
    """Write one snapshot in LAMMPS dump custom text format.

    Row formatting goes through the native C++ formatter when available
    (spherharm_tpu.native — the reference keeps this path in C++ too);
    falls back to pure Python transparently.
    """
    from spherharm_tpu import native

    cols = _column_data(state, shapes, columns, extra=extra)
    n = len(cols[columns[0]])
    lo = np.asarray(state.box_lo)
    hi = np.asarray(state.box_hi)
    bflags = " ".join("pp" if p else "ff" for p in periodic)
    header = "ITEM: TIMESTEP\n%d\n" % int(state.step)
    header += "ITEM: NUMBER OF ATOMS\n%d\n" % n
    header += "ITEM: BOX BOUNDS %s\n" % bflags
    for d in range(3):
        header += "%.9g %.9g\n" % (lo[d], hi[d])
    header += "ITEM: ATOMS %s\n" % " ".join(columns)
    mat = np.stack([cols[c] for c in columns], axis=1)
    int_mask = np.asarray(
        [1 if c in ("id", "type") else 0 for c in columns], np.int32
    )
    mode = "ab" if append else "wb"
    blob = native.format_dump_rows(mat, int_mask, header)
    if blob is None:
        lines = [header]
        for row in mat:
            lines.append(" ".join(
                str(int(v)) if c in ("id", "type") else "%.8g" % v
                for c, v in zip(columns, row)
            ) + "\n")
        blob = "".join(lines).encode()
    with open(path, mode) as f:
        f.write(blob)


def read_dump(path):
    """Parse a (single- or multi-snapshot) dump file -> list of dicts."""
    frames = []
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        assert lines[i].startswith("ITEM: TIMESTEP")
        step = int(lines[i + 1])
        assert lines[i + 2].startswith("ITEM: NUMBER OF ATOMS")
        n = int(lines[i + 3])
        assert lines[i + 4].startswith("ITEM: BOX BOUNDS")
        bounds = np.array(
            [[float(v) for v in lines[i + 5 + d].split()] for d in range(3)]
        )
        header = lines[i + 8].split()[2:]
        rows = np.array(
            [[float(v) for v in lines[i + 9 + r].split()] for r in range(n)]
        )
        frames.append({
            "step": step, "n": n, "bounds": bounds,
            "columns": header,
            "data": {c: rows[:, k] for k, c in enumerate(header)},
        })
        i += 9 + n
    return frames
