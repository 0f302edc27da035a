"""Shared pieces of the MLS fit models."""

from __future__ import annotations

import jax.numpy as jnp

RADIUS_CUTOFF = 0.99   # kernels/mls.cl:36
HITS_CUTOFF = 4        # kernels/mls.cl:37
FLT_EPSILON = 1.1920929e-07


def solve_quadratic(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Root of ax^2 + bx + c that is larger (a > 0) or smaller (a < 0);
    NaN if no real root. Requires b >= 0. Branch-free version of the
    numerically-stable citardauq form (kernels/mls.cl:237-248): the primary
    expression -2c / (b + sqrt(b^2 - 4ac)) degenerates when b = 0 and ac = 0,
    in which case the classical form is used."""
    bdet = b + jnp.sqrt(b * b - 4.0 * a * c)
    x1 = -2.0 * c / bdet
    x2 = bdet / (-2.0 * a)
    x = jnp.where(jnp.isfinite(x1), x1, x2)
    return jnp.where(jnp.isfinite(x), x, jnp.nan)


def boundary_accept(q_den, sum_wpp, sum_wp, sum_w, a_vec, boundary_factor):
    """The boundary-rejection test (kernels/mls.cl:394-426): a corner is kept
    only when the fitted region is not too one-sided around the projection
    point `a_vec`. rhs = sum_i w_i |p_i - a|^2 expanded via the moments."""
    aa = jnp.sum(a_vec * a_vec, axis=-1)
    rhs = sum_wpp - 2.0 * jnp.sum(sum_wp * a_vec, axis=-1) + sum_w * aa
    return (aa < 3.0) & (q_den > boundary_factor * rhs)
