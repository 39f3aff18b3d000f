"""Native C++ I/O formatter: parity with the Python fallback."""

import os

import numpy as np
import pytest

from spherharm_tpu import native
from spherharm_tpu.io.dump import read_dump, write_dump
from spherharm_tpu.models import scenarios


def test_native_builds_and_formats():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable")
    rows = np.asarray([[1.0, 2.0, 0.5], [2.0, 1.0, -0.25]])
    out = native.format_dump_rows(rows, [1, 1, 0], "HDR\n")
    assert out == b"HDR\n1 2 0.5\n2 1 -0.25\n"


def test_native_parse_table():
    if native.get_lib() is None:
        pytest.skip("g++ unavailable")
    arr = native.parse_table("1 2.5 -3e4\n7 0.125 9\n", 2, 3)
    np.testing.assert_allclose(
        arr, [[1, 2.5, -3e4], [7, 0.125, 9]]
    )


def test_dump_native_matches_python(tmp_path):
    sim, state, neigh = scenarios.two_body_collision()
    p_native = tmp_path / "native.dump"
    p_python = tmp_path / "python.dump"
    write_dump(p_native, state, sim.shapes)
    os.environ["SPHERHARM_NO_NATIVE"] = "1"
    native._TRIED, native._LIB = False, None
    try:
        write_dump(p_python, state, sim.shapes)
    finally:
        del os.environ["SPHERHARM_NO_NATIVE"]
        native._TRIED, native._LIB = False, None
    a = read_dump(p_native)[0]
    b = read_dump(p_python)[0]
    assert a["columns"] == b["columns"]
    for c in a["columns"]:
        np.testing.assert_allclose(a["data"][c], b["data"][c], rtol=1e-7)
