"""Weighted-plane MLS fit (the reference's FIT_PLANE variant,
kernels/mls.cl:198-203,269-280,409-421). Same moment inputs as
models.sphere.sphere_distance; sum_wpn is accepted and ignored so the two
models are interchangeable."""

from __future__ import annotations

import jax.numpy as jnp

from mlsgpu_tpu.models.common import HITS_CUTOFF, boundary_accept


def plane_distance(sum_w, sum_wp, sum_wpp, sum_wn, sum_wpn, hits,
                   boundary_factor) -> jnp.ndarray:
    del sum_wpn
    mean = sum_wp / sum_w[..., None]
    norm = jnp.sqrt(jnp.sum(sum_wn * sum_wn, axis=-1))
    normal = sum_wn / norm[..., None]
    dist = -jnp.sum(normal * mean, axis=-1)

    a_vec = normal * (-dist[..., None])
    q_den = sum_wpp - jnp.sum(mean * sum_wp, axis=-1)
    accept = boundary_accept(q_den, sum_wpp, sum_wp, sum_w, a_vec, boundary_factor)
    f = jnp.where(accept & (hits >= HITS_CUTOFF), dist, jnp.nan)
    return f
