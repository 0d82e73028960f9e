"""End-to-end CenterPose detector pipeline.

Parity target: `BaseDetector.run` orchestration (src/lib/detectors/base_detector.py:
390-772) + `ObjectPoseDetector.{process,post_process,merge_outputs}`
(src/lib/detectors/object_pose.py:126-197) + `pnp_shell`
(src/lib/utils/pnp/cuboid_pnp_shell.py:11-93).

TPU-first structure:
  stage `pre`   host: affine resize to the fixed input grid, normalize (numpy).
  stage `net`+`dec`  ONE jitted XLA program: network forward + sigmoid + fused decode
                (the reference crosses device→host inside decode; we don't).
  stage `post`  host: map coords back to image space (tiny, K×2 points).
  stage `merge` host: threshold + soft-NMS over <K boxes.
  stage `pnp`   device: batched DLT+LM PnP over all surviving boxes at once.
  stage `track` host/device: Kalman + association (centerpose_tpu.tracking).

Per-stage wall-clock timing is reported with the reference's stage names
(tot/load/pre/net/dec/post/merge/pnp/track — base_detector.py:390-772, demo.py:54-57).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from centerpose_tpu.config import DATA_MEAN, DATA_STD, CenterPoseConfig
from centerpose_tpu.geometry.affine import (
    get_affine_transform,
    transform_preds,
    warp_affine,
)
from centerpose_tpu.geometry.cuboid import cuboid_vertices
from centerpose_tpu.inference.nms import soft_nms
from centerpose_tpu.models import create_model
from centerpose_tpu.ops.decode import object_pose_decode
from centerpose_tpu.ops.pnp import solve_pnp_batch_padded

# Post-process std scale factor (src/lib/utils/post_process.py:15).
_STD_COEFFICIENT = 0.32

# Category-specific visibility rejection (cuboid_pnp_shell.py:59-72).
_NUM_NOT_VISIBLE_THRESH = {
    "book": 6, "chair": 6, "cereal_box": 6,
    "camera": 3, "bottle": 3, "cup": 3,
}

DEFAULT_CAMERA = np.array(
    [[663.0287679036459, 0, 300.2775065104167],
     [0, 663.0287679036459, 395.00066121419275],
     [0, 0, 1]]
)  # demo.py:141-144


def pnp_shell_epilogue(cuboid, rotation_gl, translation_gl, projected,
                       width, height, category, kps):
    """Shared pnp_shell epilogue (cuboid_pnp_shell.py:31-93): GL pose →
    9-point camera-frame corners + width/height-normalized projections,
    category visibility rejection, normalized source keypoints.

    Returns (proj9, pts3d, kps9, ok) — pts3d/proj9 are computed even when
    `ok` is False so callers can keep attaching them to rejected detections
    (Detector.run_pnp does). Used by both run_pnp and the tracker's batched
    re-PnP (tracker.py _re_pnp_batch)."""
    pts3d = cuboid @ rotation_gl.T + translation_gl
    pts3d = np.vstack([pts3d.mean(axis=0, keepdims=True), pts3d])
    proj9 = np.vstack(
        [projected.mean(axis=0, keepdims=True), projected]
    ).astype(np.float64)
    proj9[:, 0] /= width
    proj9[:, 1] /= height

    ok = True
    thresh = _NUM_NOT_VISIBLE_THRESH.get(category)
    if thresh is not None:
        out = (
            (proj9[:, 0] < 0) | (proj9[:, 0] > 1)
            | (proj9[:, 1] < 0) | (proj9[:, 1] > 1)
        ).sum()
        if out >= thresh:
            ok = False
    if not (0 < proj9[0, 0] < 1 and 0 < proj9[0, 1] < 1):
        ok = False

    kps9 = np.asarray(kps, np.float64).reshape(-1, 2)
    kps9 = np.vstack([kps9.mean(axis=0, keepdims=True), kps9])
    kps9[:, 0] /= width
    kps9[:, 1] /= height
    return proj9, pts3d, kps9, ok


class Detector:
    """Single-category CenterPose detector (image model or tracking model)."""

    def __init__(self, config: CenterPoseConfig, variables=None, rng_seed: int = 0):
        self.cfg = config
        self.model = create_model(config)
        if variables is None:
            dummy = jnp.zeros((1, config.input_h, config.input_w, 3), jnp.float32)
            kwargs = {}
            if config.tracking_task:
                kwargs = dict(
                    pre_img=dummy,
                    pre_hm=jnp.zeros((1, config.input_h, config.input_w, 1)),
                    pre_hm_hp=jnp.zeros((1, config.input_h, config.input_w, 8)),
                )
            variables = self.model.init(jax.random.PRNGKey(rng_seed), dummy, **kwargs)
        self.variables = variables
        self.mean = np.array(DATA_MEAN, np.float32).reshape(1, 1, 3)
        self.std = np.array(DATA_STD, np.float32).reshape(1, 1, 3)
        self._forward_decode = self._build_forward()
        self.pre_images = None
        self.tracker = None
        if config.tracking_task:
            from centerpose_tpu.tracking.tracker import Tracker

            self.tracker = Tracker(config)
        elif config.refined_kalman:
            # CenterPose + KF baseline (base_detector.py:664-665).
            from centerpose_tpu.tracking.tracker_baseline import TrackerBaseline

            self.tracker = TrackerBaseline(config)

    # ------------------------------------------------------------------ net+dec
    def _build_forward(self):
        cfg = self.cfg
        # decode.py:222: gaussian fitting runs for tracking / refined-KF / rep 2.
        fit = cfg.tracking_task or cfg.refined_kalman or cfg.rep_mode == 2

        @jax.jit
        def forward_decode(variables, images, pre_img=None, pre_hm=None, pre_hm_hp=None):
            kwargs = {}
            if cfg.tracking_task:
                kwargs = dict(pre_img=pre_img, pre_hm=pre_hm, pre_hm_hp=pre_hm_hp)
            outputs = self.model.apply(variables, images, **kwargs)
            dets = object_pose_decode(
                outputs,
                k=cfg.K,
                rep_mode=cfg.rep_mode,
                inference=True,
                fit_gaussian=fit,
                apply_sigmoid=True,
                balance_coefficient=cfg.balance_coefficient,
                hm_hp_thresh=cfg.hm_hp_thresh,
            )
            return outputs, dets

        # Fused serving programs: uint8 frames + axis-aligned dst→src
        # transforms in, decoded detections out — the separable-matmul warp
        # (ops/resample.py), normalization, network, and decode in ONE XLA
        # program. One dispatch per batch/frame instead of two or three (each
        # dispatch over a remote tunnel costs ~30-45 ms), and the warp rides
        # the MXU instead of 4 XLA gathers. The warped images come back too
        # (lazily — nothing is fetched unless the caller needs pre_images or
        # debug canvases).
        @jax.jit
        def forward_decode_raw(variables, raw, transforms):
            from centerpose_tpu.ops.resample import warp_axis_aligned_batch

            images = warp_axis_aligned_batch(
                raw, transforms, cfg.input_h, cfg.input_w
            )
            outputs, dets = forward_decode(variables, images)
            return images, outputs, dets

        # Tracking twin: the previous-frame heatmap render (tracking/render.py
        # _render_maps) joins the same program, so the per-frame loop is
        # warp → render → twin-stem net → decode in one dispatch.
        @jax.jit
        def forward_decode_raw_track(variables, raw, transforms,
                                     hm_params, hp_params, pre_img):
            from centerpose_tpu.ops.resample import warp_axis_aligned_batch
            from centerpose_tpu.tracking.render import _render_maps

            images = warp_axis_aligned_batch(
                raw, transforms, cfg.input_h, cfg.input_w
            )
            pre_hm, pre_hm_hp = _render_maps(
                hm_params, hp_params, h=cfg.input_h, w=cfg.input_w
            )
            outputs, dets = forward_decode(
                variables, images,
                pre_img=pre_img, pre_hm=pre_hm, pre_hm_hp=pre_hm_hp,
            )
            return images, outputs, dets

        self._forward_decode_raw = forward_decode_raw
        self._forward_decode_raw_track = forward_decode_raw_track
        return forward_decode

    # ------------------------------------------------------------------ pre
    def pre_process(
        self, image: np.ndarray, input_meta: Optional[dict] = None,
        scale: float = 1.0, warp: bool = True,
    ):
        """All three testing modes of base_detector.pre_process (:91-148):

        - ``cfg.fix_short > 0``: short side → fix_short, long side rounded up to
          a multiple of 64; crop window spans the whole image anisotropically.
        - ``cfg.fix_res`` (the usual mode): warp-crop to (input_h, input_w). With
          ``scale != 1`` the image is first resized but the crop window keeps the
          ORIGINAL max(h, w) extent, so the object genuinely shrinks/grows on the
          input grid — true multi-scale testing, not a resample no-op.
        - keep-resolution: pad each (scaled) side to ``(dim | cfg.pad) + 1``.

        Non-fixed modes produce per-shape jit retraces (documented in config.py).
        """
        cfg = self.cfg
        height, width = image.shape[:2]
        new_height, new_width = int(height * scale), int(width * scale)
        if scale != 1.0:
            from PIL import Image

            image = np.asarray(
                Image.fromarray(np.asarray(image, np.uint8)).resize(
                    (new_width, new_height)
                )
            )

        if cfg.fix_short > 0:
            # base_detector.py:100-108 — window in ORIGINAL-image units.
            if height < width:
                inp_h = cfg.fix_short
                inp_w = (int(width / height * cfg.fix_short) + 63) // 64 * 64
            else:
                inp_h = (int(height / width * cfg.fix_short) + 63) // 64 * 64
                inp_w = cfg.fix_short
            c = np.array([width / 2.0, height / 2.0], dtype=np.float32)
            s = np.array([width, height], dtype=np.float32)
        elif cfg.fix_res:
            # base_detector.py:109-114 — center on the resized image, extent from
            # the original dims (multi-scale zoom).
            inp_h, inp_w = cfg.input_h, cfg.input_w
            c = np.array([new_width / 2.0, new_height / 2.0], dtype=np.float32)
            s = max(height, width) * 1.0
        else:
            # keep-res (base_detector.py:115-119).
            inp_h = (new_height | cfg.pad) + 1
            inp_w = (new_width | cfg.pad) + 1
            c = np.array([new_width // 2, new_height // 2], dtype=np.float32)
            s = np.array([inp_w, inp_h], dtype=np.float32)

        if warp:
            trans_input = get_affine_transform(c, s, 0, (inp_w, inp_h))
            inp = warp_affine(image.astype(np.float32), trans_input, (inp_w, inp_h))
            inp = (inp / 255.0 - self.mean) / self.std
            images = inp[None].astype(np.float32)  # NHWC
        else:
            # Fused serving path: the warp happens on device inside the same
            # XLA program as the network (run(), _forward_decode_raw*); only
            # the meta is needed here.
            images = None

        meta = {
            "c": c,
            "s": s,
            "height": height,
            "width": width,
            "out_height": inp_h // cfg.down_ratio,
            "out_width": inp_w // cfg.down_ratio,
            "camera_matrix": DEFAULT_CAMERA,
        }
        if input_meta:
            meta.update(input_meta)
        # The crop window actually used by the (host or fused device) warp.
        # input_meta may override 'c'/'s' for post_process coordinate mapping
        # (base_detector.py:139-147 merge semantics), but the warp geometry is
        # pinned to the locally computed window so the fused and host paths
        # always agree.
        meta["_warp_c"], meta["_warp_s"] = c, s
        return images, meta

    # ------------------------------------------------------------------ post
    def post_process(
        self, dets: Dict[str, np.ndarray], meta: dict,
        min_score: Optional[float] = None,
    ) -> List[dict]:
        """object_pose_post_process (src/lib/utils/post_process.py:12-68).

        Vectorized over the K detections (one batched affine per field instead
        of ~10 numpy calls per det). `min_score` drops sub-threshold dets
        BEFORE the dict build — semantically free when the caller filters on
        the same threshold right after (merge_outputs does), and the dominant
        serving-path saving: with trained weights only a handful of K=100
        slots survive."""
        c, s = meta["c"], meta["s"]
        w, h = meta["out_width"], meta["out_height"]
        # With anisotropic windows (fix_short / keep-res) `s` is a 2-vector; the
        # per-axis factor applies pairwise over flattened (x, y) sequences. (The
        # reference multiplies the flat vector by s[i]/max(w,h), which only
        # type-checks for scalar s — the fix_res case it is actually run in.)
        scale_fac = np.asarray(s, np.float64) / max(w, h)

        scores = np.asarray(dets["scores"][0, :, 0], np.float64)
        if min_score is not None:
            idxs = np.nonzero(scores > min_score)[0]
        else:
            idxs = np.arange(scores.shape[0])
        if idxs.size == 0:
            return []

        def scale_xy(arr: np.ndarray) -> np.ndarray:
            a = np.asarray(arr, np.float64)
            return (a.reshape(a.shape[0], -1, 2) * scale_fac).reshape(a.shape)

        trans = get_affine_transform(c, s, 0, (w, h), inv=True)

        def tpreds(arr: np.ndarray) -> np.ndarray:
            """Batched transform_preds over [M, 2n] rows (sentinel-preserving,
            geometry/affine.py:95-106)."""
            a = np.asarray(arr, np.float64).reshape(arr.shape[0], -1, 2)
            out = a @ trans[:, :2].T + trans[:, 2]
            invalid = (a[..., 0] == -10000) & (a[..., 1] == -10000)
            out[invalid] = -10000.0
            return out

        sel = {k_: np.asarray(v[0])[idxs] for k_, v in dets.items()}
        bboxes = tpreds(sel["bboxes"].reshape(idxs.size, 4)).reshape(idxs.size, 4)
        kps = tpreds(sel["kps"]).reshape(idxs.size, -1)
        kdm = tpreds(sel["kps_displacement_mean"]).reshape(idxs.size, -1)
        khm = tpreds(sel["kps_heatmap_mean"]).reshape(idxs.size, -1)
        kds = scale_xy(sel["kps_displacement_std"]) * _STD_COEFFICIENT
        khs = scale_xy(sel["kps_heatmap_std"]) * _STD_COEFFICIENT
        trk = scale_xy(sel["tracking"])
        trk_hp = scale_xy(sel["tracking_hp"])

        results = []
        for m, jdx in enumerate(idxs):
            bbox = bboxes[m]
            results.append({
                "score": float(scores[jdx]),
                "cls": int(sel["clses"][m, 0]),
                "obj_scale": np.array(sel["obj_scale"][m]),
                "obj_scale_uncertainty": np.array(sel["obj_scale_uncertainty"][m]),
                "kps_displacement_std": kds[m],
                "tracking": trk[m],
                "tracking_hp": trk_hp[m],
                "bbox": bbox,
                "ct": [(bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2],
                "kps": kps[m],
                "kps_displacement_mean": kdm[m],
                "kps_heatmap_mean": khm[m],
                "kps_heatmap_std": khs[m],
                "kps_heatmap_height": sel["kps_heatmap_height"][m],
            })
        return results

    # ------------------------------------------------------------------ merge
    def merge_outputs(self, detections: List[dict]) -> List[dict]:
        """Threshold + soft-NMS (object_pose.py:184-197)."""
        results = [d for d in detections if d["score"] > self.cfg.vis_thresh]
        # soft-NMS when enabled OR merging multiple test scales (object_pose.py:193).
        if (self.cfg.nms or len(self.cfg.test_scales) > 1) and results:
            bboxes = np.stack([d["bbox"] for d in results])
            scores = np.array([d["score"] for d in results])
            keep = soft_nms(
                bboxes, scores, nt=0.5, method=2, threshold=self.cfg.vis_thresh
            )
            results = [results[i] for i in keep]
        return results

    # ------------------------------------------------------------------ fusion
    def gaussian_fusion(self, det: dict) -> None:
        """Inverse-variance fusion of displacement vs heatmap keypoints
        (base_detector.py:502-544). Mutates det in place."""
        hm_mean = det["kps_heatmap_mean"]
        hm_std = det["kps_heatmap_std"]
        d_mean = det["kps_displacement_mean"]
        d_std = det["kps_displacement_std"]

        heat_bad = (hm_mean < 0) | (hm_std < 0)
        if self.cfg.hps_uncertainty:
            var_d = np.maximum(d_std, 1e-9) ** -2.0
            var_h = np.maximum(hm_std, 1e-9) ** -2.0
            std_f = (var_d + var_h) ** -0.5
            mean_f = std_f ** 2 * (var_d * d_mean + var_h * hm_mean)
            std = np.where(heat_bad, d_std, std_f)
            mean = np.where(heat_bad, d_mean, mean_f)
        else:
            std_f = np.maximum(hm_std, 1e-9) / np.sqrt(2)
            var_h = np.maximum(hm_std, 1e-9) ** -2.0
            mean_f = std_f ** 2 * (var_h * d_mean + var_h * hm_mean)
            std = np.where(heat_bad, 20.0, std_f)
            mean = np.where(heat_bad, d_mean, mean_f)
        det["kps_fusion_mean"] = mean
        det["kps_fusion_std"] = std

    # ------------------------------------------------------------------ pnp
    def _pnp_points(self, det: dict) -> np.ndarray:
        """Assemble the PnP point set for a detection by rep_mode
        (base_detector.py:550-650)."""
        mode = self.cfg.rep_mode
        if mode in (0, 3, 4):
            return np.asarray(det["kps"], np.float64).reshape(-1, 2)
        if mode == 2:
            return self._pnp_points_sampled(det)
        # rep_mode 1 (default): 16 points interleaved [disp_j, heat_j].
        p1 = np.asarray(det["kps_displacement_mean"], np.float64).reshape(-1, 2)
        p2 = np.asarray(det["kps_heatmap_mean"], np.float64).reshape(-1, 2)
        return np.hstack([p1, p2]).reshape(-1, 2)

    def _pnp_points_sampled(self, det: dict, n_sample: int = 20) -> np.ndarray:
        """rep_mode 2 (base_detector.py:568-650): per joint, draw N_sample points
        from the displacement⊕heatmap estimate mixture. The reference fits a
        2-component sklearn GMM to samples of the two gaussians and resamples;
        sampling the mixture directly is statistically equivalent and
        dependency-free."""
        rng = np.random.RandomState(0)
        d_mean = np.asarray(det["kps_displacement_mean"], np.float64).reshape(-1, 2)
        h_mean = np.asarray(det["kps_heatmap_mean"], np.float64).reshape(-1, 2)
        h_std = np.abs(
            np.asarray(det["kps_heatmap_std"], np.float64).reshape(-1, 2)
        )
        points = []
        for j in range(d_mean.shape[0]):
            if h_mean[j, 0] < -5000 or h_mean[j, 1] < -5000:
                # heatmap estimate missing → displacement-only, wide std.
                std = np.array([5.0, 5.0])
                pts = d_mean[j] + rng.randn(n_sample, 2) * np.sqrt(std)
            else:
                std = np.maximum(h_std[j], 1e-3)
                half = n_sample // 2
                pts = np.vstack(
                    [
                        h_mean[j] + rng.randn(half, 2) * np.sqrt(std),
                        d_mean[j] + rng.randn(n_sample - half, 2) * np.sqrt(std),
                    ]
                )
            points.append(pts)
        return np.vstack(points)

    def _pnp_assemble(self, results: List[dict]):
        """Point sets + normalized cuboids for a list of detections."""
        points = np.stack([self._pnp_points(d) for d in results])  # [M, N, 2]
        cuboids = np.stack(
            [
                cuboid_vertices(
                    np.asarray(d["obj_scale"], np.float64)
                    / max(float(d["obj_scale"][1]), 1e-9)
                )
                for d in results
            ]
        )
        return points, cuboids

    def run_pnp_multi(
        self, results_list: List[List[dict]], metas: List[dict]
    ) -> List[List[tuple]]:
        """pnp_shell over MANY images' surviving boxes in ONE padded device
        solve (per-box intrinsics). The per-image run_pnp costs a device
        dispatch each — over a remote tunnel that RTT (~30-45 ms) dominated
        the round-4 e2e batch profile (14.3 s of 24.2 s); one dispatch for the
        whole batch amortizes it away."""
        counts = [len(r) for r in results_list]
        if sum(counts) == 0:
            return [[] for _ in results_list]
        pts, cubs, cams = [], [], []
        for results, meta in zip(results_list, metas):
            if not results:
                continue
            p, c = self._pnp_assemble(results)
            pts.append(p)
            cubs.append(c)
            cams.append(
                np.broadcast_to(
                    np.asarray(meta["camera_matrix"], np.float64),
                    (len(results), 3, 3),
                )
            )
        points = np.concatenate(pts)
        cuboids = np.concatenate(cubs)
        cameras = np.concatenate(cams)
        res = solve_pnp_batch_padded(
            points.astype(np.float32),
            cuboids.astype(np.float32),
            cameras.astype(np.float32),
        )
        res = jax.device_get(res)  # one fetch for all result fields
        boxes_all, off = [], 0
        for results, meta, n in zip(results_list, metas, counts):
            if n == 0:
                boxes_all.append([])
                continue
            res_i = jax.tree_util.tree_map(lambda x: x[off:off + n], res)
            boxes_all.append(
                self._pnp_consume(results, cuboids[off:off + n], res_i, meta)
            )
            off += n
        return boxes_all

    def run_pnp(self, results: List[dict], meta: dict) -> List[tuple]:
        """Batched pnp_shell over all surviving boxes (cuboid_pnp_shell.py:11-93)."""
        if not results:
            return []
        camera = np.asarray(meta["camera_matrix"], np.float64)
        points, cuboids = self._pnp_assemble(results)
        # Padded solve: M is data-dependent per image; the power-of-two bucket
        # keeps serving from retracing for every distinct detection count.
        res = solve_pnp_batch_padded(
            np.asarray(points, np.float32),
            np.asarray(cuboids, np.float32),
            np.asarray(camera, np.float32),
        )
        res = jax.device_get(res)  # one fetch for all result fields
        return self._pnp_consume(results, cuboids, res, meta)

    def _pnp_consume(self, results, cuboids, res, meta) -> List[tuple]:
        """Host epilogue of pnp_shell: pose fields, visibility rejection."""
        cat = self.cfg.category
        boxes = []
        for m, det in enumerate(results):
            if not res.valid[m]:
                continue
            # OpenGL pose is the eval-facing result (cuboid_pnp_solver.py:234-239).
            location = res.translation_gl[m]
            quaternion = res.quaternion_gl[m]
            det["location"] = location.tolist()
            det["quaternion_xyzw"] = quaternion.tolist()
            det["projected_cuboid"] = res.projected[m]

            # 3D corners, normalized projections, visibility rejection
            # (pnp_shell:31-93) — shared with the tracker's re-PnP.
            proj9, pts3d, kps9, ok = pnp_shell_epilogue(
                cuboids[m], res.rotation_gl[m], location, res.projected[m],
                meta["width"], meta["height"], cat, det["kps"],
            )
            det["kps_3d_cam"] = pts3d
            det["kps_pnp"] = proj9
            if not ok:
                continue
            boxes.append(
                (proj9, pts3d, np.array(det["obj_scale"]), kps9, det)
            )
        return boxes

    # ------------------------------------------------------------------ run
    def run(self, image: np.ndarray, meta_inp: Optional[dict] = None) -> Dict[str, Any]:
        cfg = self.cfg
        times = {"pre": 0.0, "net": 0.0, "post": 0.0}
        t0 = time.time()

        scales = (1.0,) if cfg.tracking_task else tuple(cfg.test_scales)
        detections = []
        meta = None
        for scale in scales:
            ts = time.time()
            # Fused single-stream path: the standard fix_res crop at scale 1
            # is axis-aligned, so the warp (and for tracking the pre-hm
            # render) joins the network's XLA program — one dispatch per
            # frame instead of 2-3, and no host-side warp on weak hosts.
            # Multi-scale / fix_short / keep-res / debug runs keep the
            # host-warp path (they need host inputs or non-standard windows);
            # so does a tracking video's FIRST frame (pre_images must exist
            # before the fused program can take it as an input).
            fused = (
                scale == 1.0 and cfg.fix_res and cfg.fix_short <= 0
                and getattr(self, "debug_level", 0) < 2
                and not (cfg.tracking_task and self.pre_images is None)
                and not getattr(self, "force_host_warp", False)
            )
            if fused:
                images, meta_s = self.pre_process(
                    image, meta_inp, scale=scale, warp=False
                )
                raw = jnp.asarray(np.asarray(image))[None]
                invs = jnp.asarray(
                    get_affine_transform(
                        meta_s["_warp_c"], meta_s["_warp_s"], 0,
                        (cfg.input_w, cfg.input_h), inv=True,
                    ).astype(np.float32)
                )[None]
            else:
                images, meta_s = self.pre_process(image, meta_inp, scale=scale)
            if scale == 1.0 or meta is None:
                meta = meta_s
            t1 = time.time()
            times["pre"] += t1 - ts

            extra = {}
            if fused and cfg.tracking_task:
                from centerpose_tpu.tracking.render import render_inputs

                tracks = (
                    []
                    if cfg.empty_pre_hm
                    else (self.tracker.active_tracks() if self.tracker else [])
                )
                hm_p, hp_p = render_inputs(tracks, meta_s, cfg)
                images_j, outputs, dets = self._forward_decode_raw_track(
                    self.variables, raw, invs,
                    tuple(jnp.asarray(a) for a in hm_p),
                    tuple(jnp.asarray(a) for a in hp_p),
                    self.pre_images,
                )
            elif fused:
                images_j, outputs, dets = self._forward_decode_raw(
                    self.variables, raw, invs
                )
            else:
                images_j = jnp.asarray(images)
                if cfg.tracking_task:
                    pre_hm, pre_hm_hp, pre_images = self._tracking_inputs(
                        images_j, meta_s
                    )
                    extra = dict(
                        pre_img=pre_images, pre_hm=pre_hm, pre_hm_hp=pre_hm_hp
                    )
                outputs, dets = self._forward_decode(
                    self.variables, images_j, **extra
                )
            dets = jax.device_get(dets)  # one fetch, not one RTT per key
            if getattr(self, "debug_level", 0) >= 2 and scale == 1.0:
                # Raw maps for render_debug (object_pose.py:199-279 canvases).
                self._debug_raw = {
                    "inp": np.asarray(images[0]),
                    "hm": np.asarray(outputs["hm"][0], np.float32),
                    "hm_hp": (
                        np.asarray(outputs["hm_hp"][0], np.float32)
                        if "hm_hp" in outputs else None
                    ),
                    "dets": dets,
                    "pre_hm": (
                        np.asarray(extra["pre_hm"][0]) if "pre_hm" in extra else None
                    ),
                    "pre_hm_hp": (
                        np.asarray(extra["pre_hm_hp"][0])
                        if "pre_hm_hp" in extra else None
                    ),
                    "pre_img": (
                        np.asarray(extra["pre_img"][0]) if "pre_img" in extra else None
                    ),
                }
            t2 = time.time()
            times["net"] += t2 - t1

            scale_dets = self.post_process(dets, meta_s,
                                           min_score=cfg.vis_thresh)
            if scale != 1.0:
                # Coordinates back to the unscaled image (object_pose.py:174-179).
                for det in scale_dets:
                    for key in (
                        "bbox", "kps", "kps_displacement_std", "tracking",
                        "tracking_hp", "kps_displacement_mean", "kps_heatmap_mean",
                    ):
                        if key in det:
                            det[key] = np.asarray(det[key], np.float64) / scale
                    det["ct"] = [
                        (det["bbox"][0] + det["bbox"][2]) / 2,
                        (det["bbox"][1] + det["bbox"][3]) / 2,
                    ]
            detections.extend(scale_dets)
            times["post"] += time.time() - t2
        times["dec"] = 0.0  # fused into `net` — one XLA program
        t3 = time.time()

        results = self.merge_outputs(detections)
        t4 = time.time()
        times["merge"] = t4 - t3

        if cfg.tracking_task or cfg.refined_kalman:
            for det in results:
                self.gaussian_fusion(det)

        boxes = self.run_pnp(results, meta)
        t5 = time.time()
        times["pnp"] = t5 - t4

        if self.tracker is not None:
            results, boxes = self.tracker.step(results, boxes, meta)
            if cfg.tracking_task:
                self.pre_images = images_j
        t6 = time.time()
        times["track"] = t6 - t5
        times["tot"] = t6 - t0

        return {
            "results": results,
            "boxes": boxes,
            "meta": meta,
            "times": times,
        }

    def _tracking_inputs(self, images_j, meta):
        """Render previous-frame heatmaps from tracker state
        (base_detector.py:150-388), on device."""
        from centerpose_tpu.tracking.render import render_previous_heatmaps

        cfg = self.cfg
        if self.pre_images is None:
            self.pre_images = images_j
            if self.tracker is not None and "pre_dets" in meta:
                self.tracker.init_track(meta)
        tracks = (
            []
            if cfg.empty_pre_hm  # eval ablation --eval_empty_pre_hm
            else (self.tracker.active_tracks() if self.tracker else [])
        )
        pre_hm, pre_hm_hp = render_previous_heatmaps(tracks, meta, cfg)
        return pre_hm, pre_hm_hp, self.pre_images

    def _batch_submit(self, images: List[np.ndarray],
                      metas: Optional[List[dict]] = None,
                      timing: bool = False) -> dict:
        """Device half of the batched path: build per-image metas/transforms,
        submit transfer → warp → net → decode (async JAX dispatch — returns
        before the device finishes). Host post-processing happens in
        `_batch_finish`; keeping the two apart lets `run_batch_stream` overlap
        chunk N's host work with chunk N+1's device work."""
        cfg = self.cfg
        assert not cfg.tracking_task, "batched mode is for the image model"
        metas = metas or [None] * len(images)
        t0 = time.time()

        # Device-side preprocessing: the affine crop + normalization runs on
        # device (the reference warps per image on the CPU,
        # base_detector.py:127-133 — a serving bottleneck on weak hosts).
        from centerpose_tpu.ops.resample import axis_aligned, preprocess_on_device

        pre_meta = []
        inv_transforms = []
        for img, m in zip(images, metas):
            height, width = img.shape[:2]
            c = np.array([width / 2.0, height / 2.0], dtype=np.float32)
            s = max(height, width) * 1.0
            meta = {
                "c": c, "s": s, "height": height, "width": width,
                "out_height": cfg.input_h // cfg.down_ratio,
                "out_width": cfg.input_w // cfg.down_ratio,
                "camera_matrix": DEFAULT_CAMERA,
            }
            if m:
                meta.update(m)
            pre_meta.append(meta)
            inv_transforms.append(
                get_affine_transform(c, s, 0, (cfg.input_w, cfg.input_h), inv=True)
            )
        fused = (
            len({im.shape for im in images}) == 1
            and axis_aligned(inv_transforms)
        )
        if fused:
            # One dispatch: uint8 transfer → MXU warp → net → decode.
            raw = jnp.asarray(np.stack(images))
            invs = jnp.asarray(np.stack(inv_transforms).astype(np.float32))
            t1 = time.time()
            _, _, dets = self._forward_decode_raw(self.variables, raw, invs)
        else:
            batch = preprocess_on_device(
                images, inv_transforms, cfg.input_h, cfg.input_w
            )
            if timing:
                float(jax.device_get(batch[0, 0, 0, 0]))  # force pre completion
            t1 = time.time()
            _, dets = self._forward_decode(self.variables, batch)
        return {"dets": dets, "pre_meta": pre_meta, "t0": t0, "t1": t1}

    def _batch_finish(self, handle: dict, timing: bool = False
                      ) -> List[Dict[str, Any]]:
        """Host half: fetch decode outputs, per-image post/merge, one padded
        PnP dispatch for the whole batch."""
        cfg = self.cfg
        pre_meta = handle["pre_meta"]
        t0, t1 = handle["t0"], handle["t1"]
        # ONE fetch for all decode outputs: per-key np.asarray pays a tunnel
        # round-trip per array; device_get issues the copies together.
        dets = jax.device_get(handle["dets"])
        t2 = time.time()

        times = {"pre": t1 - t0, "net": t2 - t1, "post": 0.0, "merge": 0.0,
                 "pnp": 0.0}
        results_list = []
        for i, meta in enumerate(pre_meta):
            ts = time.time()
            dets_i = {k_: v[i : i + 1] for k_, v in dets.items()}
            # Sub-threshold dets never survive merge_outputs — drop them
            # before the per-det dict build.
            detections = self.post_process(dets_i, meta,
                                           min_score=cfg.vis_thresh)
            tp = time.time()
            results_list.append(self.merge_outputs(detections))
            tm = time.time()
            times["post"] += tp - ts
            times["merge"] += tm - tp

        # ONE padded PnP dispatch for the whole batch (per-box intrinsics).
        tq0 = time.time()
        boxes_list = self.run_pnp_multi(results_list, pre_meta)
        times["pnp"] = time.time() - tq0

        outs = []
        for results, boxes, meta in zip(results_list, boxes_list, pre_meta):
            out = {"results": results, "boxes": boxes, "meta": meta}
            if timing:
                out["times"] = times  # shared batch-level dict
            outs.append(out)
        times["tot"] = time.time() - t0
        return outs

    def run_batch(
        self, images: List[np.ndarray], metas: Optional[List[dict]] = None,
        timing: bool = False,
    ) -> List[Dict[str, Any]]:
        """Batched folder/offline inference: ONE jitted warp+forward+decode over
        the whole batch, then per-image host post-processing and one batched PnP.

        The reference's folder mode loops single images (demo.py:45-57); batching
        the network pass is the TPU-native serving path (BASELINE config 2).

        timing=True adds a shared per-stage wall-clock dict under "times" in
        each output (pre/net/post/merge/pnp/tot for the WHOLE batch), forcing a
        small device fetch after the device stages so they measure execution,
        not dispatch (block_until_ready can return early on the axon platform).
        """
        return self._batch_finish(
            self._batch_submit(images, metas, timing=timing), timing=timing
        )

    def run_batch_stream(self, chunks, timing: bool = False):
        """Pipelined batched serving: generator over (images, metas) chunks
        that keeps ONE chunk in flight on the device — chunk N's host
        post/merge/PnP overlaps chunk N+1's transfer + warp+net+decode (JAX
        dispatch is async). Yields the same per-image output lists run_batch
        returns, in order. The steady-state throughput is max(host half,
        device half) instead of their sum."""
        pending = None
        for images, metas in chunks:
            handle = self._batch_submit(images, metas, timing=timing)
            if pending is not None:
                yield self._batch_finish(pending, timing=timing)
            pending = handle
        if pending is not None:
            yield self._batch_finish(pending, timing=timing)

    def reset_tracking(self):
        self.pre_images = None
        if self.tracker is not None:
            self.tracker.reset()

    # ------------------------------------------------------------------ debug
    def render_debug(self, image: np.ndarray, out: Dict[str, Any]):
        """The reference detector's debug canvases (`ObjectPoseDetector.debug`
        object_pose.py:199-279 + `show_results` :281-313): heatmap blends over
        the warped network input, decoded-keypoint views, and the final
        image-space render with PnP cuboids, scale text, and object axes.

        Requires a prior `run` with `self.debug_level >= 2` (stashes raw maps).
        Returns the Debugger (canvases in `.imgs`; `save_all_imgs` to dump).
        """
        from centerpose_tpu.utils.debugger import Debugger

        cfg = self.cfg
        raw = getattr(self, "_debug_raw", None)
        dbg = Debugger(down_ratio=cfg.down_ratio)

        if raw is not None:
            inp = ((raw["inp"] * self.std + self.mean) * 255.0).clip(0, 255).astype(
                np.uint8
            )
            sig = 1.0 / (1.0 + np.exp(-raw["hm"]))
            dbg.add_blend_img(inp, dbg.gen_colormap(sig, inp.shape[:2]), "out_hm_pred")
            dets = raw["dets"]
            r = cfg.down_ratio
            for k in range(dets["scores"].shape[1]):
                if dets["scores"][0, k, 0] > cfg.vis_thresh:
                    dbg.add_coco_bbox(
                        dets["bboxes"][0, k] * r, 0, dets["scores"][0, k, 0],
                        show_txt=False, img_id="out_hm_pred",
                    )
            if raw["hm_hp"] is not None:
                sig_hp = 1.0 / (1.0 + np.exp(-raw["hm_hp"]))
                dbg.add_blend_img(
                    inp, dbg.gen_colormap_hp(sig_hp, inp.shape[:2]), "out_hmhp_pred"
                )
                for k in range(dets["scores"].shape[1]):
                    if dets["scores"][0, k, 0] > cfg.vis_thresh:
                        dbg.add_coco_hp(
                            dets["kps_displacement_mean"][0, k] * r,
                            img_id="out_hmhp_pred",
                        )
            # Decoded keypoint estimates: displacement (pred) vs heatmap (extra).
            dbg.add_img(inp, "out_kps_processed_pred")
            for k in range(dets["scores"].shape[1]):
                if dets["scores"][0, k, 0] <= cfg.vis_thresh:
                    continue
                dbg.add_coco_hp(
                    dets["kps_displacement_mean"][0, k] * r,
                    img_id="out_kps_processed_pred",
                )
                hm_kps = np.asarray(dets["kps_heatmap_mean"][0, k], np.float64)
                hm_kps = np.where(hm_kps <= -10000, -10000.0, hm_kps * r)
                dbg.add_coco_hp(hm_kps, img_id="out_kps_processed_pred",
                                pred_flag="extra")
            if "tracking" in dets:
                dbg.add_img(inp, "out_tracking_pred")
                for k in range(dets["scores"].shape[1]):
                    if dets["scores"][0, k, 0] <= cfg.vis_thresh:
                        continue
                    bb = dets["bboxes"][0, k] * r
                    ct = [(bb[0] + bb[2]) / 2, (bb[1] + bb[3]) / 2]
                    dbg.add_arrow(ct, dets["tracking"][0, k] * r,
                                  "out_tracking_pred", c=(255, 255, 0))
            if raw.get("pre_img") is not None:
                pre_img = (
                    (raw["pre_img"] * self.std + self.mean) * 255.0
                ).clip(0, 255).astype(np.uint8)
                if raw.get("pre_hm") is not None:
                    dbg.add_blend_img(
                        pre_img,
                        dbg.gen_colormap(raw["pre_hm"], pre_img.shape[:2]),
                        "pre_hm",
                    )
                if raw.get("pre_hm_hp") is not None:
                    dbg.add_blend_img(
                        pre_img,
                        dbg.gen_colormap_hp(raw["pre_hm_hp"], pre_img.shape[:2]),
                        "pre_hmhp",
                    )

        # Final image-space render (show_results, object_pose.py:281-313).
        dbg.add_img(np.asarray(image, np.uint8), "out_img_pred")
        h, w = np.asarray(image).shape[:2]
        camera = DEFAULT_CAMERA
        if out.get("meta") and "camera_matrix" in out["meta"]:
            camera = np.asarray(out["meta"]["camera_matrix"], np.float64)
        for det in out.get("results", []):
            dbg.add_coco_bbox(det["bbox"], 0, det["score"], img_id="out_img_pred")
            dbg.add_coco_hp(det["kps"], img_id="out_img_pred")
        for box in out.get("boxes", ()):
            proj9, pts3d, obj_scale, _, det = box
            proj = np.asarray(proj9, np.float64)[1:].copy()
            proj[:, 0] *= w
            proj[:, 1] *= h
            dbg.add_coco_hp(proj, img_id="out_img_pred", pred_flag="pnp")
            dbg.add_obj_scale(det["bbox"], obj_scale, img_id="out_img_pred",
                              pred_flag="pnp")
            dbg.add_axes(np.asarray(pts3d, np.float64), camera,
                         img_id="out_img_pred")
        return dbg
