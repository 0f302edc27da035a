"""Independent numpy/float64 oracles for the device ops: a brute-force MLS
evaluator (the role the host-side SplatTree + analytic fixtures play in
test/test_mls.cpp:59-130) and synthetic splat-cloud generators."""

from __future__ import annotations

import numpy as np

RADIUS_CUTOFF = 0.99
HITS_CUTOFF = 4


def mls_field_bruteforce(splats: np.ndarray, corners: np.ndarray,
                         boundary_factor: float = 0.0,
                         shape: str = "sphere") -> np.ndarray:
    """Evaluate the MLS signed distance at each corner by brute force in
    float64. splats: (N, 8) [x y z radius nx ny nz quality] in the same
    (grid) frame as corners (M, 3). Returns (M,) float64 with NaN undefined."""
    splats = np.asarray(splats, dtype=np.float64)
    corners = np.asarray(corners, dtype=np.float64)
    out = np.full(len(corners), np.nan)
    pos = splats[:, 0:3]
    r2 = splats[:, 3] ** 2
    nrm = splats[:, 4:7]
    qual = splats[:, 7]

    for i, c in enumerate(corners):
        p = pos - c
        pp = np.sum(p * p, axis=1)
        d = pp / r2
        keep = d < RADIUS_CUTOFF
        hits = int(np.sum(keep))
        if hits < HITS_CUTOFF:
            continue
        w = (1.0 - d[keep]) ** 4 * qual[keep]
        pk, nk, ppk = p[keep], nrm[keep], pp[keep]
        sum_w = np.sum(w)
        sum_wp = w @ pk
        sum_wpp = np.dot(w, ppk)
        sum_wn = w @ nk
        sum_wpn = np.dot(w, np.sum(nk * pk, axis=1))

        if shape == "sphere":
            m = sum_wp / sum_w
            q_num = sum_wpn - np.dot(m, sum_wn)
            q_den = sum_wpp - np.dot(m, sum_wp)
            q = q_num / q_den if q_den != 0 else np.inf
            if abs(q_den) < 4 * np.finfo(np.float32).eps * hits * abs(sum_wpp) \
                    or not np.isfinite(q):
                q = 0.0
            a = 0.5 * q
            b = (sum_wn - q * sum_wp) / sum_w
            cc = (-a * sum_wpp - np.dot(b, sum_wp)) / sum_w
            b2 = np.dot(b, b)
            l = _solve_quadratic(a * b2, b2, cc)
            a_vec = l * b
            if not np.all(np.isfinite(a_vec)):
                continue
            aa = np.dot(a_vec, a_vec)
            rhs = sum_wpp - 2 * np.dot(sum_wp, a_vec) + sum_w * aa
            if aa < 3.0 and q_den > boundary_factor * rhs:
                out[i] = -np.dot(b, a_vec) / np.sqrt(b2)
        else:
            mean = sum_wp / sum_w
            normal = sum_wn / np.linalg.norm(sum_wn)
            dist = -np.dot(normal, mean)
            a_vec = -dist * normal
            aa = np.dot(a_vec, a_vec)
            q_den = sum_wpp - np.dot(mean, sum_wp)
            rhs = sum_wpp - 2 * np.dot(sum_wp, a_vec) + sum_w * aa
            if aa < 3.0 and q_den > boundary_factor * rhs:
                out[i] = dist
    return out


def _solve_quadratic(a: float, b: float, c: float) -> float:
    disc = b * b - 4 * a * c
    if disc < 0:
        return np.nan
    bdet = b + np.sqrt(disc)
    with np.errstate(divide="ignore", invalid="ignore"):
        x = -2.0 * c / bdet if bdet != 0 else np.inf
        if not np.isfinite(x):
            x = bdet / (-2.0 * a) if a != 0 else np.nan
    return x if np.isfinite(x) else np.nan


def sphere_cloud(center, radius, n, splat_radius, rng, quality=None) -> np.ndarray:
    """Splats uniformly sampled on an analytic sphere, outward normals
    (the fixture style of test/test_mls.cpp and test/test_marching.cpp)."""
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pos = np.asarray(center, np.float64) + radius * v
    out = np.empty((n, 8), np.float32)
    out[:, 0:3] = pos
    out[:, 3] = splat_radius
    out[:, 4:7] = v
    out[:, 7] = (1.0 / splat_radius ** 2) if quality is None else quality
    return out


def plane_cloud(z0, extent, n, splat_radius, rng) -> np.ndarray:
    """Splats on the plane z = z0 over [0, extent]^2, +z normals."""
    xy = rng.uniform(0, extent, size=(n, 2))
    out = np.empty((n, 8), np.float32)
    out[:, 0] = xy[:, 0]
    out[:, 1] = xy[:, 1]
    out[:, 2] = z0
    out[:, 3] = splat_radius
    out[:, 4:6] = 0.0
    out[:, 6] = 1.0
    out[:, 7] = 1.0 / splat_radius ** 2
    return out
