import numpy as np
import pytest

import jax.numpy as jnp

from centerpose_tpu.config import preset
from centerpose_tpu.data.targets import ObjectAnnotation, render_targets, stack_batch
from centerpose_tpu.training.losses import (
    CenterPoseLossConfig,
    centerpose_loss,
    focal_loss,
    gather_by_ind,
    kld_scale_loss,
    reg_l1_loss,
    reg_weighted_l1_loss,
)

B, S, H, W, M = 2, 2, 16, 16, 4


def _logit(p):
    p = np.clip(p, 1e-4, 1 - 1e-4)
    return np.log(p / (1 - p))


class TestFocal:
    def test_perfect_prediction_low_loss(self):
        gt = np.zeros((1, 1, H, W, 1), np.float32)
        gt[0, 0, 5, 5, 0] = 1.0
        pred_good = np.full((1, H, W, 1), 1e-4, np.float32)
        pred_good[0, 5, 5, 0] = 1 - 1e-4
        pred_bad = np.full((1, H, W, 1), 0.5, np.float32)
        l_good = float(focal_loss(jnp.asarray(pred_good), jnp.asarray(gt))[0, 0])
        l_bad = float(focal_loss(jnp.asarray(pred_bad), jnp.asarray(gt))[0, 0])
        assert l_good < 0.01 < l_bad

    def test_no_positives_uses_neg_only(self):
        gt = np.zeros((1, 1, H, W, 1), np.float32)
        pred = np.full((1, H, W, 1), 1e-4, np.float32)
        l = float(focal_loss(jnp.asarray(pred), jnp.asarray(gt))[0, 0])
        assert 0 <= l < 0.1

    def test_per_symmetry_values_differ(self):
        gt = np.zeros((1, 2, H, W, 1), np.float32)
        gt[0, 0, 5, 5, 0] = 1.0
        gt[0, 1, 10, 10, 0] = 1.0
        pred = np.full((1, H, W, 1), 1e-4, np.float32)
        pred[0, 5, 5, 0] = 0.9
        l = np.asarray(focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
        assert l[0, 0] < l[0, 1]


class TestRegLosses:
    def _setup(self):
        rng = np.random.RandomState(0)
        feat = rng.randn(B, H, W, 2).astype(np.float32)
        ind = rng.randint(0, H * W, size=(B, S, M))
        mask = np.ones((B, S, M), np.float32)
        # target == gathered pred -> zero loss
        flat = feat.reshape(B, H * W, 2)
        target = np.stack(
            [np.stack([flat[b][ind[b, s]] for s in range(S)]) for b in range(B)]
        )
        return feat, ind, mask, target

    def test_gather_by_ind(self):
        feat, ind, _, target = self._setup()
        got = np.asarray(gather_by_ind(jnp.asarray(feat), jnp.asarray(ind)))
        np.testing.assert_allclose(got, target, atol=1e-6)

    def test_zero_when_exact(self):
        feat, ind, mask, target = self._setup()
        l = np.asarray(
            reg_l1_loss(
                jnp.asarray(feat), jnp.asarray(mask), jnp.asarray(ind),
                jnp.asarray(target),
            )
        )
        np.testing.assert_allclose(l, 0.0, atol=1e-6)

    def test_l1_value(self):
        feat, ind, mask, target = self._setup()
        l = np.asarray(
            reg_l1_loss(
                jnp.asarray(feat), jnp.asarray(mask), jnp.asarray(ind),
                jnp.asarray(target + 1.0),
            )
        )
        # |target+1 - pred| = 1 per element; sum/(mask count) = D = 2.
        np.testing.assert_allclose(l, 2.0, atol=1e-3)

    def test_mask_zeroes_loss(self):
        feat, ind, mask, target = self._setup()
        l = np.asarray(
            reg_l1_loss(
                jnp.asarray(feat), jnp.zeros_like(jnp.asarray(mask)),
                jnp.asarray(ind), jnp.asarray(target + 5.0),
            )
        )
        np.testing.assert_allclose(l, 0.0, atol=1e-6)

    def test_weighted_l1_per_coord_mask(self):
        feat, ind, _, target = self._setup()
        mask4 = np.zeros((B, S, M, 2), np.float32)
        mask4[..., 0] = 1.0  # only x-coordinate supervised
        l = np.asarray(
            reg_weighted_l1_loss(
                jnp.asarray(feat), jnp.asarray(mask4), jnp.asarray(ind),
                jnp.asarray(target + 1.0),
            )
        )
        np.testing.assert_allclose(l, 1.0, atol=1e-3)

    def test_residual_dimension_ref(self):
        """use_residual branch (losses.py:165-172): the head predicts
        log-residuals; pred = exp(pred) * dimension_ref before the L1."""
        rng = np.random.RandomState(1)
        ref = (0.78, 1.0, 0.77)
        feat = rng.randn(B, H, W, 3).astype(np.float32)
        ind = rng.randint(0, H * W, size=(B, S, M))
        mask = np.ones((B, S, M), np.float32)
        flat = feat.reshape(B, H * W, 3)
        gathered = np.stack(
            [np.stack([flat[b][ind[b, s]] for s in range(S)]) for b in range(B)]
        )
        # target = exp(pred) * ref -> residual loss is exactly zero.
        target = np.exp(gathered) * np.asarray(ref, np.float32)
        l = np.asarray(
            reg_l1_loss(
                jnp.asarray(feat), jnp.asarray(mask), jnp.asarray(ind),
                jnp.asarray(target), dimension_ref=ref,
            )
        )
        np.testing.assert_allclose(l, 0.0, atol=1e-5)
        # Without the ref decode the same target is far from the raw pred.
        l_plain = np.asarray(
            reg_l1_loss(
                jnp.asarray(feat), jnp.asarray(mask), jnp.asarray(ind),
                jnp.asarray(target),
            )
        )
        assert np.all(l_plain > 0.1)

    def test_dimension_ref_config_property(self):
        from centerpose_tpu.config import DIMENSION_REF

        cfg = preset("centerpose", category="cup", use_residual=True)
        means = DIMENSION_REF["cup"][0]
        assert cfg.dimension_ref == pytest.approx((means[3], 1.0, means[4]))
        # mug sub-model uses the mug statistics (opts.py:411).
        cfg_mug = preset("centerpose", category="cup", mug=True, use_residual=True)
        assert cfg_mug.dimension_ref == pytest.approx(
            (DIMENSION_REF["mug"][0][3], 1.0, DIMENSION_REF["mug"][0][4])
        )
        assert cfg_mug.num_symmetry == 1  # mug is NOT 12-fold symmetric
        cfg_abs = preset(
            "centerpose", category="shoe", use_residual=True,
            use_absolute_scale=True,
        )
        assert cfg_abs.dimension_ref == pytest.approx(
            DIMENSION_REF["shoe"][0][:3]
        )
        assert preset("centerpose", category="shoe").dimension_ref is None

    def test_kld_scale_finite_and_penalizes_error(self):
        feat, ind, mask, target = self._setup()
        unc = np.zeros((B, H, W, 2), np.float32)  # log-var = 0 -> var = 1
        l_exact = np.asarray(
            kld_scale_loss(
                jnp.asarray(feat), jnp.asarray(unc), jnp.asarray(mask),
                jnp.asarray(ind), jnp.asarray(target), 0.01,
            )
        )
        l_off = np.asarray(
            kld_scale_loss(
                jnp.asarray(feat), jnp.asarray(unc), jnp.asarray(mask),
                jnp.asarray(ind), jnp.asarray(target + 2.0), 0.01,
            )
        )
        assert np.all(np.isfinite(l_exact)) and np.all(np.isfinite(l_off))
        assert np.all(l_off > l_exact)


class TestFullLoss:
    def _batch_and_outputs(self, s=1):
        cfg = preset("centerpose", input_h=64, input_w=64, num_symmetry=s)
        rng = np.random.RandomState(0)
        samples = []
        for _ in range(2):
            obj = ObjectAnnotation(
                center=np.array([8.0, 8.0]),
                size=np.array([6.0, 6.0]),
                keypoints=rng.uniform(4, 12, size=(s, 8, 2)).astype(np.float32),
                keypoints_visible=np.ones((s, 8), bool),
                scale_3d=np.array([1.0, 1.0, 1.0], np.float32),
            )
            samples.append(render_targets([obj], cfg))
        batch = {k: jnp.asarray(v) for k, v in stack_batch(samples).items()}
        outputs = {
            "hm": jnp.asarray(rng.randn(2, 16, 16, 1).astype(np.float32)),
            "hm_hp": jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32)),
            "hps": jnp.zeros((2, 16, 16, 16), jnp.float32),
            "wh": jnp.zeros((2, 16, 16, 2), jnp.float32),
            "reg": jnp.zeros((2, 16, 16, 2), jnp.float32),
            "hp_offset": jnp.zeros((2, 16, 16, 2), jnp.float32),
            "scale": jnp.zeros((2, 16, 16, 3), jnp.float32),
        }
        return cfg, batch, outputs

    def test_loss_finite_and_stats_complete(self):
        cfg, batch, outputs = self._batch_and_outputs()
        loss, stats, choice = centerpose_loss(
            outputs, batch, CenterPoseLossConfig(), "train"
        )
        assert np.isfinite(float(loss))
        for key in (
            "hm_loss", "hp_loss", "wh_loss", "off_loss", "hp_offset_loss",
            "hm_hp_loss", "obj_scale_loss", "loss",
        ):
            assert key in stats and np.isfinite(float(stats[key]))
        assert choice.shape == (2,)

    def test_symmetry_argmin_prefers_matching_copy(self):
        cfg, batch, outputs = self._batch_and_outputs(s=2)
        # Make the hps output exactly match symmetry copy 1's targets for sample 0.
        hps_t = np.asarray(batch["hps"])  # [B, S, M, 16]
        ind = np.asarray(batch["ind"])
        hps_map = np.zeros((2, 16, 16, 16), np.float32)
        flat_idx = ind[0, 1, 0]
        hps_map[0].reshape(-1, 16)[flat_idx] = hps_t[0, 1, 0]
        outputs = dict(outputs, hps=jnp.asarray(hps_map))
        _, _, choice = centerpose_loss(outputs, batch, CenterPoseLossConfig(), "train")
        assert int(choice[0]) == 1

    def test_val_phase_relative_scale(self):
        cfg, batch, outputs = self._batch_and_outputs()
        loss, stats, _ = centerpose_loss(
            outputs, batch, CenterPoseLossConfig(), "val"
        )
        assert np.isfinite(float(loss))
