"""Rotated-BEV pairwise IoU inside jit (pure jnp, fixed shapes).

Framework extension — OFF by default.  The reference suppresses lidar
duplicates with axis-aligned NMS on the center±dim footprint, rotation
ignored ("Turned off auto rotating", ref lib/utils/filter_predictions.py:55-67),
so two detections of the same object whose headings differ can fall under
the NMS threshold and both survive.  `TEST.ROTATED_NMS = True` switches the
final lidar filter to true rotated-footprint IoU.

XLA-native formulation (no polygon loops, no dynamic vertex counts): the
intersection of two convex quads is computed from a FIXED 24-slot candidate
vertex buffer — 4 corners of A tested inside B, 4 of B inside A, and the
16 edge-pair crossing points — masked, angularly sorted around the valid
centroid, and integrated with a masked shoelace.  Everything is (N, M, 24)
tensor algebra, so it vmaps/batches and runs on the VPU with static shapes.

The host-side numpy oracle (Sutherland-Hodgman) lives in
evaluation/eval_utils.py; parity is asserted in tests/test_rotated_iou.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# inside-test slack (length^2 units); candidates missed by the corner test
# on exact-boundary contact are recovered by the edge-crossing candidates
_EPS = 1e-6


def box5_corners(b5: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) [xc, yc, l, w, ry] -> (..., 4, 2) corners, counter-clockwise.

    Same footprint convention as the eval oracle
    (evaluation/eval_utils.py box_to_corners_bev): l along the heading
    direction, w across it.
    """
    xc, yc, l, w, ry = (b5[..., i] for i in range(5))
    c, s = jnp.cos(ry), jnp.sin(ry)
    sx = jnp.stack([l, l, -l, -l], axis=-1) * 0.5
    sy = jnp.stack([-w, w, w, -w], axis=-1) * 0.5
    x = xc[..., None] + sx * c[..., None] - sy * s[..., None]
    y = yc[..., None] + sx * s[..., None] + sy * c[..., None]
    return jnp.stack([x, y], axis=-1)


def _points_in_quad(pts: jnp.ndarray, quad: jnp.ndarray) -> jnp.ndarray:
    """pts (P, 2) inside convex CCW quad (4, 2) -> (P,) bool."""
    e = jnp.roll(quad, -1, axis=0) - quad  # (4, 2)
    w = pts[:, None, :] - quad[None, :, :]  # (P, 4, 2)
    cr = e[None, :, 0] * w[..., 1] - e[None, :, 1] * w[..., 0]
    return jnp.all(cr >= -_EPS, axis=1)


def _pair_intersection_area(ca: jnp.ndarray, cb: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two convex CCW quads given as (4, 2) corners."""
    in_ab = _points_in_quad(ca, cb)
    in_ba = _points_in_quad(cb, ca)

    # all 16 edge-pair crossings: A edge p + t*r, B edge q + u*s
    p, r = ca, jnp.roll(ca, -1, axis=0) - ca
    q, s = cb, jnp.roll(cb, -1, axis=0) - cb
    denom = r[:, None, 0] * s[None, :, 1] - r[:, None, 1] * s[None, :, 0]
    qp = q[None, :, :] - p[:, None, :]  # (4, 4, 2)
    t_num = qp[..., 0] * s[None, :, 1] - qp[..., 1] * s[None, :, 0]
    u_num = qp[..., 0] * r[:, None, 1] - qp[..., 1] * r[:, None, 0]
    nonpar = jnp.abs(denom) > 1e-12
    safe = jnp.where(nonpar, denom, 1.0)
    t = t_num / safe
    u = u_num / safe
    crossing = nonpar & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
    xpts = p[:, None, :] + t[..., None] * r[:, None, :]

    cand = jnp.concatenate([ca, cb, xpts.reshape(16, 2)], axis=0)  # (24, 2)
    valid = jnp.concatenate([in_ab, in_ba, crossing.reshape(16)], axis=0)

    # angular sort around the valid-centroid, masked shoelace over the
    # first k slots (invalid slots sort to the tail via +inf angle)
    k = jnp.sum(valid)
    centroid = jnp.sum(jnp.where(valid[:, None], cand, 0.0), axis=0) / jnp.maximum(
        k, 1
    ).astype(cand.dtype)
    ang = jnp.arctan2(cand[:, 1] - centroid[1], cand[:, 0] - centroid[0])
    order = jnp.argsort(jnp.where(valid, ang, jnp.inf))
    v = cand[order]
    idx = jnp.arange(cand.shape[0])
    nxt = jnp.where(idx + 1 < k, idx + 1, 0)  # wrap the k-gon
    cross = v[:, 0] * v[nxt, 1] - v[nxt, 0] * v[:, 1]
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(idx < k, cross, 0.0)))
    return jnp.where(k >= 3, area, 0.0)


def rotated_iou_matrix(a5: jnp.ndarray, b5: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated IoU of (N, 5) vs (M, 5) boxes [xc, yc, l, w, ry]."""
    a5 = a5.astype(jnp.float32)
    b5 = b5.astype(jnp.float32)
    ca = box5_corners(a5)
    cb = box5_corners(b5)
    inter = jax.vmap(
        lambda x: jax.vmap(lambda y: _pair_intersection_area(x, y))(cb)
    )(ca)
    area_a = a5[:, 2] * a5[:, 3]
    area_b = b5[:, 2] * b5[:, 3]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 1e-9, inter / union, 0.0)


__all__ = ["box5_corners", "rotated_iou_matrix"]
