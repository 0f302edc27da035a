"""Algebraic-sphere MLS fit (Guennebaud & Gross style), vectorized.

Re-derivation of the reference's fitSphere / projectOriginSphere
(kernels/mls.cl:210-267): fit the scalar field s(x) = a|x|^2 + b.x + c whose
gradient matches the weighted splat normals and whose zero set approximates
the weighted splat positions, then report the signed distance from the corner
(the local origin) to the zero set.

All inputs are *corner-centered* moments, batched over arbitrary leading axes:
    sum_w    (...,)    sum of weights
    sum_wp   (..., 3)  sum of w * (x - corner)
    sum_wpp  (...,)    sum of w * |x - corner|^2
    sum_wn   (..., 3)  sum of w * n
    sum_wpn  (...,)    sum of w * n . (x - corner)
    hits     (...,)    number of contributing splats
Returns the signed distance (positive outside), NaN where undefined.
"""

from __future__ import annotations

import jax.numpy as jnp

from mlsgpu_tpu.models.common import (
    FLT_EPSILON, HITS_CUTOFF, boundary_accept, solve_quadratic)


def sphere_distance(sum_w, sum_wp, sum_wpp, sum_wn, sum_wpn, hits,
                    boundary_factor) -> jnp.ndarray:
    inv_sum_w = 1.0 / sum_w
    m = sum_wp * inv_sum_w[..., None]
    q_num = sum_wpn - jnp.sum(m * sum_wn, axis=-1)
    q_den = sum_wpp - jnp.sum(m * sum_wp, axis=-1)
    q = q_num / q_den
    # Numeric-instability guard (kernels/mls.cl:217-219)
    unstable = (jnp.abs(q_den) < (4 * FLT_EPSILON) * hits * jnp.abs(sum_wpp))
    q = jnp.where(unstable | ~jnp.isfinite(q), 0.0, q)

    a = 0.5 * q
    b = (sum_wn - q[..., None] * sum_wp) * inv_sum_w[..., None]
    c = (-a * sum_wpp - jnp.sum(b * sum_wp, axis=-1)) * inv_sum_w
    b2 = jnp.sum(b * b, axis=-1)

    # Project the origin onto the sphere: a_vec = l * b with
    # (a*b2) l^2 + b2 l + c = 0 (kernels/mls.cl:263-267).
    l = solve_quadratic(a * b2, b2, c)
    a_vec = l[..., None] * b

    accept = boundary_accept(q_den, sum_wpp, sum_wp, sum_w, a_vec, boundary_factor)
    f = -jnp.sum(b * a_vec, axis=-1) / jnp.sqrt(b2)
    f = jnp.where(accept & (hits >= HITS_CUTOFF), f, jnp.nan)
    return f
