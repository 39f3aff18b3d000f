"""Neighbor subsystem vs O(N^2) oracle (SURVEY.md section 4.3 (d))."""

import jax.numpy as jnp
import numpy as np

from spherharm_tpu.ops import neighbor


def neighbor_sets(idx, mask):
    idx = np.asarray(idx)
    mask = np.asarray(mask)
    return [set(idx[i][mask[i]].tolist()) for i in range(idx.shape[0])]


def brute_force_sets(x, box_lo, box_hi, cutoff, periodic):
    x = np.asarray(x, np.float64)
    L = np.asarray(box_hi) - np.asarray(box_lo)
    n = x.shape[0]
    out = [set() for _ in range(n)]
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = x[j] - x[i]
            for k in range(3):
                if periodic[k]:
                    d[k] -= round(d[k] / L[k]) * L[k]
            if (d @ d) < cutoff**2:
                out[i].add(j)
    return out


def _run_case(periodic, seed=0, n=120, cutoff=0.55):
    rng = np.random.default_rng(seed)
    box_lo = np.zeros(3)
    box_hi = np.array([3.0, 2.5, 2.0])
    x = rng.uniform(box_lo, box_hi, (n, 3))
    active = np.ones(n, bool)
    active[-7:] = False  # some inactive capacity slots
    grid = neighbor.CellGrid(box_lo, box_hi, cutoff, periodic)
    idx, mask, count, ovf = neighbor.cell_list_neighbors(
        jnp.asarray(x, jnp.float32), jnp.asarray(active),
        jnp.asarray(box_lo, jnp.float32), jnp.asarray(box_hi, jnp.float32),
        jnp.float32(cutoff), grid.dims, cell_cap=24, k_max=48,
        periodic=periodic,
    )
    assert int(ovf) <= 48, "k_max overflow in test setup"
    got = neighbor_sets(idx, mask)
    want = brute_force_sets(x, box_lo, box_hi, cutoff, periodic)
    for i in range(n):
        if not active[i]:
            assert got[i] == set()
        else:
            want_i = {j for j in want[i] if active[j]}
            assert got[i] == want_i, f"row {i}: {got[i]} != {want_i}"


def test_cell_list_nonperiodic():
    _run_case((False, False, False))


def test_cell_list_periodic():
    _run_case((True, True, True), seed=3)


def test_cell_list_mixed_periodic():
    _run_case((True, False, True), seed=5)


def test_allpairs_matches_oracle():
    rng = np.random.default_rng(1)
    n, cutoff = 40, 0.8
    box_lo, box_hi = np.zeros(3), np.full(3, 2.0)
    x = rng.uniform(0, 2, (n, 3))
    idx, mask, count = neighbor.allpairs_neighbors(
        jnp.asarray(x, jnp.float32), jnp.ones(n, bool),
        jnp.asarray(box_lo, jnp.float32), jnp.asarray(box_hi, jnp.float32),
        jnp.float32(cutoff), k_max=n, periodic=(True, True, True),
    )
    got = neighbor_sets(idx, mask)
    want = brute_force_sets(x, box_lo, box_hi, cutoff, (True, True, True))
    for i in range(n):
        assert got[i] == want[i]


def test_remap_history():
    # Old list: rows with known springs; new list reshuffled + fresh ids.
    old_idx = jnp.asarray([[1, 2, 3], [0, 2, 5], [9, 9, 9]], jnp.int32)
    old_mask = jnp.asarray([[1, 1, 0], [1, 1, 1], [0, 0, 0]], bool)
    old_hist = jnp.arange(27, dtype=jnp.float32).reshape(3, 3, 3)
    new_idx = jnp.asarray([[2, 7, 1], [5, 0, 1], [4, 9, 9]], jnp.int32)
    new_mask = jnp.asarray([[1, 1, 1], [1, 1, 1], [1, 1, 0]], bool)
    h = np.asarray(
        neighbor.remap_history(new_idx, new_mask, old_idx, old_mask, old_hist)
    )
    np.testing.assert_allclose(h[0, 0], np.asarray(old_hist)[0, 1])  # 2 -> kept
    np.testing.assert_allclose(h[0, 1], 0.0)                         # 7 -> fresh
    np.testing.assert_allclose(h[0, 2], np.asarray(old_hist)[0, 0])  # 1 -> kept
    np.testing.assert_allclose(h[1, 0], np.asarray(old_hist)[1, 2])  # 5 -> kept
    np.testing.assert_allclose(h[1, 2], 0.0)  # 1 was not an old neighbor of row 1
    np.testing.assert_allclose(h[2], 0.0)     # old row fully masked


def test_remap_history_chunked_matches():
    rng = np.random.default_rng(0)
    N, K = 300, 8
    old_idx = jnp.asarray(rng.integers(0, N, (N, K)), jnp.int32)
    old_mask = jnp.asarray(rng.random((N, K)) < 0.7)
    old_hist = jnp.asarray(rng.normal(size=(N, K, 3)), jnp.float32)
    new_idx = jnp.asarray(rng.integers(0, N, (N, K)), jnp.int32)
    new_mask = jnp.asarray(rng.random((N, K)) < 0.7)
    a = neighbor.remap_history(new_idx, new_mask, old_idx, old_mask, old_hist,
                               chunk=64)
    b = neighbor.remap_history(new_idx, new_mask, old_idx, old_mask, old_hist,
                               chunk=100000)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_wrap_positions():
    x = jnp.asarray([[2.5, -0.5, 0.5]], jnp.float32)
    img = jnp.zeros((1, 3), jnp.int32)
    lo = jnp.zeros(3, jnp.float32)
    hi = jnp.full(3, 2.0, jnp.float32)
    xw, img2 = neighbor.wrap_positions(x, img, lo, hi, (True, True, False))
    np.testing.assert_allclose(np.asarray(xw)[0], [0.5, 1.5, 0.5], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(img2)[0], [1, -1, 0])
