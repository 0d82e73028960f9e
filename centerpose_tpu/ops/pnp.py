"""Batched perspective-n-point in JAX — replaces per-object cv2.solvePnPGeneric loops.

Parity target: `CuboidPNPSolver.solve_pnp` (src/lib/utils/pnp/cuboid_pnp_solver.py:
91-239) as invoked by `pnp_shell` (cuboid_pnp_shell.py:11-93):
  * 2D points carry a "<-5000 == invalid" sentinel; each 2D point i corresponds to 3D
    cuboid corner i // (n_points / 8)  (rep_mode 1 passes 16 points: displacement and
    heatmap estimates interleaved per corner).
  * cv2.SOLVEPNP_ITERATIVE ≈ DLT initialization + Levenberg-Marquardt refinement of
    the reprojection error; here: weighted-DLT via a 12x12 eigendecomposition +
    branchless fixed-iteration LM, all inside one jit and vmappable over objects.
  * z < 0 solutions are rejected (solver returns valid=False), matching
    cuboid_pnp_solver.py:207-220.
  * Returns both the OpenCV-frame pose and the OpenGL-converted pose (x↔y swap,
    z negated — cuboid_pnp_solver.py:179-196).

The whole batch of K detections solves as ONE vmapped program: no python loop, no
host round-trip (reference HOT LOOP #3, SURVEY §3.1).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_MIN_POINTS = 6  # DLT init needs >=6; reference uses EPnP below 6 (rare in practice)
_LM_ITERS = 20


class PnPResult(NamedTuple):
    valid: jnp.ndarray          # [] bool
    rotation: jnp.ndarray       # [3, 3] OpenCV-frame R
    translation: jnp.ndarray    # [3]    OpenCV-frame t
    quaternion: jnp.ndarray     # [4]    xyzw, OpenCV frame
    rotation_gl: jnp.ndarray    # [3, 3] OpenGL-converted
    translation_gl: jnp.ndarray # [3]
    quaternion_gl: jnp.ndarray  # [4]    xyzw, OpenGL frame
    projected: jnp.ndarray      # [8, 2] reprojected cuboid corners (OpenCV projection)
    reproj_error: jnp.ndarray   # []     mean reprojection error over valid points


def rotation_to_quaternion(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix → quaternion (x, y, z, w), branchless Shepperd's method."""
    t = jnp.trace(r)
    qw = jnp.sqrt(jnp.maximum(1.0 + t, 1e-12)) / 2.0
    qx = jnp.sqrt(jnp.maximum(1.0 + r[0, 0] - r[1, 1] - r[2, 2], 1e-12)) / 2.0
    qy = jnp.sqrt(jnp.maximum(1.0 - r[0, 0] + r[1, 1] - r[2, 2], 1e-12)) / 2.0
    qz = jnp.sqrt(jnp.maximum(1.0 - r[0, 0] - r[1, 1] + r[2, 2], 1e-12)) / 2.0
    qx = jnp.copysign(qx, r[2, 1] - r[1, 2])
    qy = jnp.copysign(qy, r[0, 2] - r[2, 0])
    qz = jnp.copysign(qz, r[1, 0] - r[0, 1])
    q = jnp.array([qx, qy, qz, qw])
    return q / jnp.maximum(jnp.linalg.norm(q), 1e-12)


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle → rotation matrix (matrix exponential on so(3))."""
    theta = jnp.linalg.norm(rvec)
    safe = jnp.maximum(theta, 1e-12)
    k = rvec / safe
    kx = jnp.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]]
    )
    r = (
        jnp.eye(3)
        + jnp.sin(theta) * kx
        + (1.0 - jnp.cos(theta)) * (kx @ kx)
    )
    return jnp.where(theta < 1e-9, jnp.eye(3), r)


def _project(points3d, r, t, camera):
    pc = points3d @ r.T + t
    z = jnp.maximum(jnp.abs(pc[:, 2]), 1e-9) * jnp.sign(
        jnp.where(pc[:, 2] == 0, 1.0, pc[:, 2])
    )
    u = camera[0, 0] * pc[:, 0] / z + camera[0, 2]
    v = camera[1, 1] * pc[:, 1] / z + camera[1, 2]
    return jnp.stack([u, v], axis=-1)


def _dlt_init(points3d, points2d_norm, weights):
    """Weighted DLT for [R|t] from normalized image points. Returns (R, t)."""
    n = points3d.shape[0]
    x, y = points2d_norm[:, 0], points2d_norm[:, 1]
    X = points3d
    zeros = jnp.zeros((n, 4))
    Xh = jnp.concatenate([X, jnp.ones((n, 1))], axis=1)  # [n, 4]
    row1 = jnp.concatenate([Xh, zeros, -x[:, None] * Xh], axis=1)  # [n, 12]
    row2 = jnp.concatenate([zeros, Xh, -y[:, None] * Xh], axis=1)
    a = jnp.concatenate([row1, row2], axis=0)  # [2n, 12]
    w = jnp.concatenate([weights, weights], axis=0)[:, None]
    a = a * w

    ata = a.T @ a
    _, vecs = jnp.linalg.eigh(ata)
    p = vecs[:, 0].reshape(3, 4)  # smallest eigenvector

    m = p[:, :3]
    # Scale so rows of R have unit norm on average; sign so points sit in front.
    scale = jnp.power(jnp.maximum(jnp.abs(jnp.linalg.det(m)), 1e-12), 1.0 / 3.0)
    m = m / scale
    t = p[:, 3] / scale
    # Orthogonalize via SVD.
    u, _, vt = jnp.linalg.svd(m)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    r = u @ jnp.diag(jnp.array([1.0, 1.0, d])) @ vt
    # Choose global sign so the (weighted) mean depth is positive.
    pc_z = (points3d @ r.T + t)[:, 2]
    mean_z = jnp.sum(pc_z * weights) / jnp.maximum(jnp.sum(weights), 1e-9)
    flip = jnp.where(mean_z < 0, -1.0, 1.0)
    # Flipping P's sign maps (R, t) -> (-R, -t); re-orthogonalize the sign flip
    # by rotating 180° — equivalently recompute from -m.
    u2, _, vt2 = jnp.linalg.svd(m * flip)
    d2 = jnp.sign(jnp.linalg.det(u2 @ vt2))
    r2 = u2 @ jnp.diag(jnp.array([1.0, 1.0, d2])) @ vt2
    return r2, t * flip


def _rvec_from_matrix(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix → axis-angle (inverse Rodrigues), branchless."""
    cos_t = jnp.clip((jnp.trace(r) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    axis_raw = jnp.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
    sin_t = jnp.maximum(jnp.sin(theta), 1e-9)
    axis = axis_raw / (2.0 * sin_t)
    # Near theta == pi the off-diagonal formula degenerates; use the diagonal.
    diag_axis = jnp.sqrt(jnp.maximum((jnp.diag(r) + 1.0) / 2.0, 0.0))
    diag_axis = diag_axis * jnp.sign(
        jnp.array([1.0, jnp.sign(r[0, 1] + 1e-30), jnp.sign(r[0, 2] + 1e-30)])
    )
    near_pi = theta > 3.1
    axis = jnp.where(near_pi, diag_axis / jnp.maximum(jnp.linalg.norm(diag_axis), 1e-9), axis)
    return jnp.where(theta < 1e-9, jnp.zeros(3), axis * theta)


def _lm_refine(points3d, points2d, weights, camera, r0, t0):
    """Fixed-iteration Levenberg-Marquardt on weighted reprojection error."""
    params0 = jnp.concatenate([_rvec_from_matrix(r0), t0])

    def residuals(params):
        r = rodrigues(params[:3])
        proj = _project(points3d, r, params[3:], camera)
        return ((proj - points2d) * weights[:, None]).reshape(-1)

    def cost(params):
        res = residuals(params)
        return jnp.sum(res ** 2)

    def step(state, _):
        params, lam, best_cost = state
        res = residuals(params)
        jac = jax.jacfwd(residuals)(params)  # [2n, 6]
        h = jac.T @ jac + lam * jnp.eye(6)
        g = jac.T @ res
        delta = jnp.linalg.solve(h, g)
        cand = params - delta
        cand_cost = cost(cand)
        improved = cand_cost < best_cost
        params = jnp.where(improved, cand, params)
        lam = jnp.where(improved, lam / 3.0, lam * 10.0)
        lam = jnp.clip(lam, 1e-10, 1e10)
        best_cost = jnp.minimum(cand_cost, best_cost)
        return (params, lam, best_cost), None

    state0 = (params0, jnp.asarray(1e-3), cost(params0))
    (params, _, final_cost), _ = jax.lax.scan(step, state0, None, length=_LM_ITERS)
    return rodrigues(params[:3]), params[3:], final_cost


_GL_SWAP = jnp.array(
    [[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, -1.0]]
)  # cuboid_pnp_solver.py:184-189


def solve_pnp_single(
    points2d: jnp.ndarray,
    cuboid3d: jnp.ndarray,
    camera: jnp.ndarray,
    min_required_points: int = 4,
) -> PnPResult:
    """Solve one object's pose from its (possibly invalid) 2D cuboid points.

    Args:
      points2d: [N, 2]; entries with any coordinate < -5000 are invalid
                (cuboid_pnp_solver.py:145).
      cuboid3d: [8, 3] corner coordinates (binary-counting order).
      camera:   [3, 3] intrinsics.
    """
    n = points2d.shape[0]
    reps = n // 8  # each corner appears n/8 times (cuboid_pnp_solver.py:149)
    # rep_mode-1 layout interleaves per corner: [c0_disp, c0_heat, c1_disp, ...];
    # point i maps to corner i // reps.
    points3d = cuboid3d[jnp.arange(n) // reps]

    weights = (
        (points2d[:, 0] > -5000) & (points2d[:, 1] > -5000)
    ).astype(jnp.float32)
    n_valid = jnp.sum(weights)
    points2d_safe = jnp.where(weights[:, None] > 0, points2d, 0.0)

    # Normalized coordinates for DLT.
    fx, fy = camera[0, 0], camera[1, 1]
    cx, cy = camera[0, 2], camera[1, 2]
    norm = jnp.stack(
        [(points2d_safe[:, 0] - cx) / fx, (points2d_safe[:, 1] - cy) / fy], axis=-1
    )

    r0, t0 = _dlt_init(points3d, norm, weights)
    r, t, final_cost = _lm_refine(points3d, points2d_safe, weights, camera, r0, t0)

    reproj = _project(cuboid3d, r, t, camera)
    per_pt = jnp.linalg.norm(
        _project(points3d, r, t, camera) - points2d_safe, axis=-1
    )
    err = jnp.sum(per_pt * weights) / jnp.maximum(n_valid, 1.0)

    z_ok = t[2] > 0  # cuboid_pnp_solver.py:207-220 z<0 => fail
    valid = (n_valid >= jnp.maximum(min_required_points, _MIN_POINTS)) & z_ok

    r_gl = _GL_SWAP @ r
    t_gl = _GL_SWAP @ t

    return PnPResult(
        valid=valid,
        rotation=r,
        translation=t,
        quaternion=rotation_to_quaternion(r),
        rotation_gl=r_gl,
        translation_gl=t_gl,
        quaternion_gl=rotation_to_quaternion(r_gl),
        projected=reproj,
        reproj_error=err,
    )


@partial(jax.jit, static_argnames=("min_required_points",))
def solve_pnp_batch(
    points2d: jnp.ndarray,
    cuboid3d: jnp.ndarray,
    camera: jnp.ndarray,
    min_required_points: int = 4,
) -> PnPResult:
    """vmapped PnP over K objects: points2d [K, N, 2], cuboid3d [K, 8, 3]."""
    return jax.vmap(
        lambda p, c: solve_pnp_single(p, c, camera, min_required_points)
    )(points2d, cuboid3d)
