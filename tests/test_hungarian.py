import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from semi_detr_tpu.ops import hungarian


def _total(cost, cols, valid=None):
    rows = np.arange(cost.shape[0])
    c = cost[rows, cols]
    if valid is not None:
        c = c[valid]
    return c.sum()


@pytest.mark.parametrize("nr,nc,seed", [
    (1, 5, 0), (4, 4, 1), (7, 20, 2), (30, 900, 3), (60, 300, 4),
])
def test_matches_scipy_total_cost(nr, nc, seed):
    rng = np.random.RandomState(seed)
    cost = rng.randn(nr, nc).astype(np.float32) * 5
    cols = np.asarray(hungarian.solve(jnp.asarray(cost)))
    assert len(set(cols.tolist())) == nr, "assignment must be injective"
    r, c = linear_sum_assignment(cost)
    np.testing.assert_allclose(_total(cost, cols), cost[r, c].sum(),
                               rtol=1e-5, atol=1e-4)


def test_ties_and_integers():
    cost = np.array([[1., 1., 0.], [0., 1., 1.]], np.float32)
    cols = np.asarray(hungarian.solve(jnp.asarray(cost)))
    assert _total(cost, cols) == 0.0


def test_invalid_rows_skipped_exactly():
    """Invalid rows are SKIPPED (traced loop bound): the valid rows get
    the scipy-optimal assignment; skipped rows return -1. The mask
    pattern need not be a prefix (SSOD pseudo-label filtering isn't)."""
    rng = np.random.RandomState(7)
    nr, nc = 16, 40
    cost = rng.randn(nr, nc).astype(np.float32)
    valid = np.zeros(nr, bool)
    valid[[0, 3, 4, 9, 15]] = True
    cols = np.asarray(hungarian.solve(
        jnp.asarray(cost), jnp.asarray(valid)))
    r, c = linear_sum_assignment(cost[valid])
    np.testing.assert_allclose(_total(cost, cols, valid),
                               cost[valid][r, c].sum(), rtol=1e-5,
                               atol=1e-4)
    vcols = cols[valid].tolist()
    assert len(set(vcols)) == len(vcols), "valid assignment injective"
    assert (cols[~valid] == -1).all()


def test_vmapped_batch():
    rng = np.random.RandomState(9)
    costs = rng.randn(4, 10, 25).astype(np.float32)
    cols = np.asarray(jax.vmap(hungarian.solve)(jnp.asarray(costs)))
    for b in range(4):
        r, c = linear_sum_assignment(costs[b])
        np.testing.assert_allclose(_total(costs[b], cols[b]),
                                   costs[b][r, c].sum(), rtol=1e-5, atol=1e-4)


def test_nan_inf_costs_terminate():
    """NaN/inf costs must not hang the while_loop (scipy raises; we clamp
    to a large finite value so the compiled step terminates)."""
    from semi_detr_tpu.ops import hungarian
    rs = np.random.RandomState(0)
    c = rs.rand(4, 6).astype(np.float32)
    c[1, :] = np.nan
    c[2, 3] = np.inf
    out = np.asarray(hungarian.solve(jnp.asarray(c)))
    assert len(set(out.tolist())) == 4          # a valid assignment
