"""In-graph 1-D two-component GMM (EM) for pseudo-label cost filtering.

Replaces the reference's host-side sklearn GaussianMixture fit
(`detr_ssod/models/dino_detr_ssod.py:832-890`): 2 components, diag
covariance (`:87`), means init [min, max], weights [.5, .5], precisions 1,
reg_covar 1e-5. Runs a fixed number of EM iterations (sklearn: max_iter=100)
on a fixed-capacity masked vector — jittable and deterministic, so every
device computes the identical threshold from the all-gathered cost pool
(the reference all-gathers costs so every rank fits the same GMM).

Threshold rule (reference `:869-890`): among samples assigned to the
low-mean component (component 0), take the one with the highest GMM
log-likelihood; its cost value is the threshold. If component 0 is empty,
fall back to component 1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG2PI = 1.8378770664093453


def fit_gmm_threshold(costs: jax.Array, valid: jax.Array,
                      n_iter: int = 100, reg_covar: float = 1e-5):
    """Fit the GMM on `costs[valid]` and return the cost threshold.

    Args:
      costs: (K,) float32 — padded cost pool (e.g. all-gathered across chips).
      valid: (K,) bool — which entries are real data points.
      n_iter: fixed EM iteration count.

    Returns:
      scalar float32 threshold. With <2 valid points, returns the single
      point's value (reference `:868-869`) or 0.0 for an empty pool
      (reference `:839-840`).
    """
    costs = costs.astype(jnp.float32)
    n = jnp.maximum(valid.sum(), 1)
    big = jnp.float32(3.4e38)
    cmin = jnp.min(jnp.where(valid, costs, big))
    cmax = jnp.max(jnp.where(valid, costs, -big))

    means = jnp.stack([cmin, cmax])               # (2,)
    variances = jnp.ones((2,), jnp.float32)       # precisions_init = 1
    weights = jnp.full((2,), 0.5, jnp.float32)

    vmask = valid.astype(jnp.float32)

    def log_prob(means, variances, weights):
        # (K, 2) component log-densities + log-weights
        d2 = (costs[:, None] - means[None, :]) ** 2
        lp = -0.5 * (_LOG2PI + jnp.log(variances)[None, :]
                     + d2 / variances[None, :])
        return lp + jnp.log(weights)[None, :]

    def em_step(_, state):
        means, variances, weights = state
        wlp = log_prob(means, variances, weights)
        resp = jax.nn.softmax(wlp, axis=-1) * vmask[:, None]  # (K, 2)
        nk = resp.sum(0) + 1e-10
        means = (resp * costs[:, None]).sum(0) / nk
        variances = ((resp * (costs[:, None] - means[None, :]) ** 2).sum(0)
                     / nk + reg_covar)
        weights = nk / n
        return means, variances, weights

    means, variances, weights = jax.lax.fori_loop(
        0, n_iter, em_step, (means, variances, weights))

    wlp = log_prob(means, variances, weights)
    assign0 = wlp[:, 0] >= wlp[:, 1]              # predict == component 0
    score = jax.nn.logsumexp(wlp, axis=-1)        # score_samples

    def pick(mask):
        m = mask & valid
        s = jnp.where(m, score, -big)
        return costs[jnp.argmax(s)], m.any()

    thr0, has0 = pick(assign0)
    thr1, _ = pick(~assign0)
    thr = jnp.where(has0, thr0, thr1)
    # degenerate pools
    thr = jnp.where(valid.sum() == 0, 0.0, thr)
    thr = jnp.where(valid.sum() == 1, cmin, thr)
    return thr
