"""Batched perspective-n-point in JAX — replaces per-object cv2.solvePnPGeneric loops.

Parity target: `CuboidPNPSolver.solve_pnp` (src/lib/utils/pnp/cuboid_pnp_solver.py:
91-239) as invoked by `pnp_shell` (cuboid_pnp_shell.py:11-93):
  * 2D points carry a "<-5000 == invalid" sentinel; each 2D point i corresponds to 3D
    cuboid corner i // (n_points / 8)  (rep_mode 1 passes 16 points: displacement and
    heatmap estimates interleaved per corner).
  * cv2.SOLVEPNP_ITERATIVE ≈ DLT initialization + Levenberg-Marquardt refinement of
    the reprojection error; here: weighted-DLT via a 12x12 eigendecomposition +
    branchless fixed-iteration LM, all inside one jit and vmappable over objects.
  * below 6 valid points the reference switches to cv2.SOLVEPNP_EPNP
    (cuboid_pnp_solver.py:163-165, min_required_points=4); here: a branchless
    EPnP initializer (4-eigenvector null space, β hypotheses N=1/2/3 with
    Gauss-Newton distance refinement) feeds the same LM.
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

_DLT_MIN_POINTS = 6  # below this the EPnP initializer takes over
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
    """Axis-angle → rotation matrix (matrix exponential on so(3)).

    The norm is guarded so the function is differentiable at θ=0 (plain
    jnp.linalg.norm has a NaN gradient at the origin, which a jnp.where on the
    output would still propagate)."""
    theta = jnp.sqrt(jnp.sum(rvec ** 2) + 1e-24)
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


def _procrustes_weighted(points_w, points_c, weights):
    """Weighted Kabsch: (R, t) with points_c ≈ R @ points_w + t."""
    wsum = jnp.maximum(jnp.sum(weights), 1e-9)
    mu_w = jnp.sum(points_w * weights[:, None], axis=0) / wsum
    mu_c = jnp.sum(points_c * weights[:, None], axis=0) / wsum
    h = ((points_w - mu_w) * weights[:, None]).T @ (points_c - mu_c)
    uu, _, vt = jnp.linalg.svd(h)
    dsign = jnp.sign(jnp.linalg.det(vt.T @ uu.T))
    r = vt.T @ jnp.diag(jnp.array([1.0, 1.0, dsign])) @ uu.T
    t = mu_c - r @ mu_w
    return r, t


_PAIR_I = jnp.array([0, 0, 0, 1, 1, 2])
_PAIR_J = jnp.array([1, 2, 3, 2, 3, 3])


def _epnp_init(points3d, points2d_norm, weights):
    """EPnP initialization (Lepetit et al., OpenCV's hypothesis structure) for
    4/5-point solves — the reference switches cv2 to SOLVEPNP_EPNP below 6
    valid points (cuboid_pnp_solver.py:163-165, min_required_points=4).

    With n in {4, 5} the 12-dim control-point system MᵀM has a 2-4 dim null
    space, so the camera-frame control points are x = Σ βₖ vₖ over the 4
    smallest eigenvectors; the βs are pinned by the 6 inter-control-point
    distance equations: closed-form seeds for N = 1/2/3 active vectors, each
    Gauss-Newton-refined on the distance residuals, winner by weighted
    reprojection. Everything is branchless/fixed-shape for vmap+jit.
    """
    n = points3d.shape[0]
    c0 = jnp.mean(points3d, axis=0)
    d = points3d - c0
    cov = d.T @ d / n
    evals, evecs = jnp.linalg.eigh(cov)
    axes = evecs * jnp.sqrt(jnp.maximum(evals, 1e-12))   # columns = scaled axes
    ctrl_w = jnp.concatenate([c0[None], c0[None] + axes.T], axis=0)   # [4, 3]

    beta_w = jnp.linalg.solve(axes, d.T).T               # axes @ β.T = d.T
    alpha = jnp.concatenate(
        [1.0 - jnp.sum(beta_w, axis=-1, keepdims=True), beta_w], axis=-1
    )                                                    # [n, 4]

    u, v = points2d_norm[:, 0], points2d_norm[:, 1]
    zeros = jnp.zeros_like(alpha)
    # Unknowns: camera-frame control points, ctrl-major (x, y, z) minor.
    mu = jnp.stack([alpha, zeros, -alpha * u[:, None]], axis=-1).reshape(n, 12)
    mv = jnp.stack([zeros, alpha, -alpha * v[:, None]], axis=-1).reshape(n, 12)
    m = jnp.concatenate([mu, mv], axis=0) * jnp.concatenate(
        [weights, weights]
    )[:, None]
    _, vecs = jnp.linalg.eigh(m.T @ m)
    vnull = vecs[:, :4].T.reshape(4, 4, 3)               # [k, ctrl, xyz], ascending

    # Pairwise control-point difference vectors per null vector: [k, 6, 3].
    dv = vnull[:, _PAIR_I, :] - vnull[:, _PAIR_J, :]
    dist2 = jnp.sum(
        (ctrl_w[_PAIR_I] - ctrl_w[_PAIR_J]) ** 2, axis=-1
    )                                                    # [6]

    def gram(a, b):  # Σ_xyz dv_a[p]·dv_b[p] per pair p -> [6]
        return jnp.sum(dv[a] * dv[b], axis=-1)

    # --- β seeds (OpenCV find_betas_approx_{1,2,3} analogue) ---
    # N=1: β1² Σ||dv1||² ≈ Σ d² (least squares on the single unknown).
    b1_1 = jnp.sqrt(jnp.abs(jnp.sum(dist2 * gram(0, 0)))
                    / jnp.maximum(jnp.sum(gram(0, 0) ** 2), 1e-12))
    betas1 = jnp.array([1.0, 0.0, 0.0, 0.0]) * b1_1

    def _ls(lmat):
        ridge = 1e-9 * jnp.eye(lmat.shape[1])
        return jnp.linalg.solve(lmat.T @ lmat + ridge, lmat.T @ dist2)

    # N=2: unknowns [β11, β12, β22].
    l2 = jnp.stack([gram(0, 0), 2 * gram(0, 1), gram(1, 1)], axis=1)
    y2 = _ls(l2)
    b1 = jnp.sqrt(jnp.abs(y2[0]))
    b2 = jnp.sqrt(jnp.abs(y2[2])) * jnp.sign(y2[1]) * jnp.sign(y2[0] + 1e-30)
    betas2 = jnp.array([1.0, 0.0, 0.0, 0.0]) * b1 + jnp.array(
        [0.0, 1.0, 0.0, 0.0]
    ) * b2

    # N=3: unknowns [β11, β12, β22, β13, β23, β33] (6 eqs, 6 unknowns).
    l3 = jnp.stack(
        [gram(0, 0), 2 * gram(0, 1), gram(1, 1),
         2 * gram(0, 2), 2 * gram(1, 2), gram(2, 2)], axis=1
    )
    y3 = _ls(l3)
    b1 = jnp.sqrt(jnp.abs(y3[0]))
    b2 = jnp.sqrt(jnp.abs(y3[2])) * jnp.sign(y3[1]) * jnp.sign(y3[0] + 1e-30)
    b3 = y3[3] / jnp.where(jnp.abs(b1) < 1e-12, 1e-12, b1)
    betas3 = (
        jnp.array([1.0, 0.0, 0.0, 0.0]) * b1
        + jnp.array([0.0, 1.0, 0.0, 0.0]) * b2
        + jnp.array([0.0, 0.0, 1.0, 0.0]) * b3
    )

    def gn_refine(betas):
        # Gauss-Newton on the 6 distance residuals over the full 4-vector β.
        def step(b, _):
            diff = jnp.einsum("k,kpx->px", b, dv)        # [6, 3]
            res = jnp.sum(diff ** 2, axis=-1) - dist2    # [6]
            jac = 2.0 * jnp.einsum("px,kpx->pk", diff, dv)  # [6, 4]
            h = jac.T @ jac + 1e-6 * jnp.eye(4)
            return b - jnp.linalg.solve(h, jac.T @ res), None
        out, _ = jax.lax.scan(step, betas, None, length=6)
        return out

    def pose_from_betas(betas):
        ctrl_c = jnp.einsum("k,kcx->cx", betas, vnull)   # [4, 3]
        pts_c = alpha @ ctrl_c
        wsum = jnp.maximum(jnp.sum(weights), 1e-9)
        mean_z = jnp.sum(pts_c[:, 2] * weights) / wsum
        flip = jnp.where(mean_z < 0, -1.0, 1.0)
        pts_c = pts_c * flip
        r, t = _procrustes_weighted(points3d, pts_c, weights)
        proj = jnp.stack(
            [pts_c[:, 0] / jnp.maximum(pts_c[:, 2], 1e-9),
             pts_c[:, 1] / jnp.maximum(pts_c[:, 2], 1e-9)], axis=-1
        )
        err = jnp.sum(
            jnp.sum((proj - points2d_norm) ** 2, axis=-1) * weights
        )
        return r, t, err

    rs, ts, errs = jax.vmap(pose_from_betas)(
        jnp.stack([gn_refine(betas1), gn_refine(betas2), gn_refine(betas3)])
    )
    best = jnp.argmin(errs)
    return rs[best], ts[best]


def _lm_refine(points3d, points2d, weights, camera, r0, t0):
    """Fixed-iteration Levenberg-Marquardt on weighted reprojection error.

    State is (R, t) with LEFT multiplicative rotation updates R ← exp(δ)·R and
    a closed-form jacobian: with q = R·X, d(exp(δ)q + t)/dδ|₀ = −[q]× and
    ∂proj/∂pc the pinhole derivative. Exact linearization at the current
    estimate, no jacfwd passes, and no inverse-Rodrigues extraction (whose
    θ≈π branch is degenerate)."""
    fx, fy = camera[0, 0], camera[1, 1]

    def residuals(r, t):
        proj = _project(points3d, r, t, camera)
        return ((proj - points2d) * weights[:, None]).reshape(-1)

    def cost(r, t):
        res = residuals(r, t)
        return jnp.sum(res ** 2)

    def jacobian(r, t):
        q = points3d @ r.T            # [n, 3] rotated points (pre-translation)
        pc = q + t
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9,
                      jnp.where(pc[:, 2] < 0, -1e-9, 1e-9), pc[:, 2])
        zi = 1.0 / z
        zeros = jnp.zeros_like(zi)
        du = jnp.stack([fx * zi, zeros, -fx * pc[:, 0] * zi * zi], axis=-1)
        dv = jnp.stack([zeros, fy * zi, -fy * pc[:, 1] * zi * zi], axis=-1)
        # d pc/d[δ|t] = [−[q]× | I]  →  [n, 3, 6]
        q1, q2, q3 = q[:, 0], q[:, 1], q[:, 2]
        mcross = jnp.stack(
            [jnp.stack([zeros, q3, -q2], axis=-1),
             jnp.stack([-q3, zeros, q1], axis=-1),
             jnp.stack([q2, -q1, zeros], axis=-1)], axis=1
        )                                                    # [n, 3, 3]
        dpd = jnp.concatenate(
            [mcross, jnp.broadcast_to(jnp.eye(3), mcross.shape)], axis=-1
        )                                                    # [n, 3, 6]
        ju = jnp.einsum("ni,nij->nj", du, dpd)
        jv = jnp.einsum("ni,nij->nj", dv, dpd)
        jac = jnp.stack([ju, jv], axis=1) * weights[:, None, None]
        return jac.reshape(-1, 6)                            # [2n, 6]

    def step(state, _):
        r, t, lam, best_cost = state
        res = residuals(r, t)
        jac = jacobian(r, t)
        h = jac.T @ jac + lam * jnp.eye(6)
        g = jac.T @ res
        delta = jnp.linalg.solve(h, g)
        r_cand = rodrigues(-delta[:3]) @ r
        t_cand = t - delta[3:]
        cand_cost = cost(r_cand, t_cand)
        improved = cand_cost < best_cost
        r = jnp.where(improved, r_cand, r)
        t = jnp.where(improved, t_cand, t)
        lam = jnp.where(improved, lam / 3.0, lam * 10.0)
        lam = jnp.clip(lam, 1e-10, 1e10)
        best_cost = jnp.minimum(cand_cost, best_cost)
        return (r, t, lam, best_cost), None

    state0 = (r0, t0, jnp.asarray(1e-3), cost(r0, t0))
    (r, t, _, final_cost), _ = jax.lax.scan(step, state0, None, length=_LM_ITERS)
    return r, t, final_cost


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

    # DLT needs >= 6 correspondences; EPnP seeds 4/5-point solves (reference:
    # SOLVEPNP_EPNP below 6, cuboid_pnp_solver.py:163-165). Both are cheap at
    # this size — compute both and select branchlessly.
    r_dlt, t_dlt = _dlt_init(points3d, norm, weights)
    r_ep, t_ep = _epnp_init(points3d, norm, weights)
    use_dlt = n_valid >= _DLT_MIN_POINTS
    r0 = jnp.where(use_dlt, r_dlt, r_ep)
    t0 = jnp.where(use_dlt, t_dlt, t_ep)
    r, t, final_cost = _lm_refine(points3d, points2d_safe, weights, camera, r0, t0)

    reproj = _project(cuboid3d, r, t, camera)
    per_pt = jnp.linalg.norm(
        _project(points3d, r, t, camera) - points2d_safe, axis=-1
    )
    err = jnp.sum(per_pt * weights) / jnp.maximum(n_valid, 1.0)

    z_ok = t[2] > 0  # cuboid_pnp_solver.py:207-220 z<0 => fail
    valid = (n_valid >= min_required_points) & z_ok

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


def solve_pnp_batch_padded(
    points2d,
    cuboid3d,
    camera,
    min_required_points: int = 4,
) -> PnPResult:
    """solve_pnp_batch with the object count M padded to the next power of
    two. Serving calls solve per image with a data-dependent number of
    surviving detections; without padding every distinct M (1..K) triggers a
    fresh trace+compile — minutes each over a remote-compile tunnel. Padded
    rows carry the -10000 invalid sentinel (n_valid=0 ⇒ valid=False, matching
    the tracker's fixed-slot padding) and a unit cuboid to keep the branchless
    solver well-posed; results are sliced back to M.

    `camera` may be [3, 3] (one intrinsic for all M) or [M, 3, 3] (per-object
    — lets the serving path solve a whole multi-image batch in ONE dispatch
    even when images carry different intrinsics).

    Padding happens in host numpy: eager jnp concatenates here would each be
    their own device dispatch (a tunnel round-trip per op in remote serving);
    one memcpy on the host then ONE transfer into the jitted solve is strictly
    cheaper."""
    import numpy as np

    points2d = np.asarray(points2d)
    cuboid3d = np.asarray(cuboid3d)
    camera = np.asarray(camera)
    m = points2d.shape[0]
    mp = 1 << max(m - 1, 0).bit_length()
    if mp != m:
        pad = mp - m
        points2d = np.concatenate(
            [points2d,
             np.full((pad,) + points2d.shape[1:], -10000.0, points2d.dtype)],
            axis=0,
        )
        unit = np.array(
            [[(-0.5 if not (i & 4) else 0.5),
              (-0.5 if not (i & 2) else 0.5),
              (-0.5 if not (i & 1) else 0.5)] for i in range(8)],
            cuboid3d.dtype,
        )
        cuboid3d = np.concatenate(
            [cuboid3d, np.broadcast_to(unit, (pad, 8, 3))], axis=0
        )
        if camera.ndim == 3:
            # Benign intrinsic for the dead rows (weights are all zero there,
            # but the branchless DLT/EPnP still divides by fx/fy).
            safe = np.array(
                [[500.0, 0.0, 0.0], [0.0, 500.0, 0.0], [0.0, 0.0, 1.0]],
                camera.dtype,
            )
            camera = np.concatenate(
                [camera, np.broadcast_to(safe, (pad, 3, 3))], axis=0
            )
    res = solve_pnp_batch(points2d, cuboid3d, camera, min_required_points)
    if mp != m:
        res = jax.tree_util.tree_map(lambda x: x[:m], res)
    return res


@partial(jax.jit, static_argnames=("min_required_points",))
def solve_pnp_batch(
    points2d: jnp.ndarray,
    cuboid3d: jnp.ndarray,
    camera: jnp.ndarray,
    min_required_points: int = 4,
) -> PnPResult:
    """vmapped PnP over K objects: points2d [K, N, 2], cuboid3d [K, 8, 3];
    camera [3, 3] shared or [K, 3, 3] per-object."""
    if camera.ndim == 3:
        return jax.vmap(
            lambda p, c, cam: solve_pnp_single(p, c, cam, min_required_points)
        )(points2d, cuboid3d, camera)
    return jax.vmap(
        lambda p, c: solve_pnp_single(p, c, camera, min_required_points)
    )(points2d, cuboid3d)
