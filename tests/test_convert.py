import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centerpose_tpu.config import preset
from centerpose_tpu.models import create_model
from centerpose_tpu.models.convert import (
    _torch_key_for,
    convert_state_dict,
    strip_module_prefix,
)


def _flatten(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, path + (k,))
    else:
        yield path, tree


@pytest.fixture(scope="module")
def dlav1_variables():
    cfg = preset("centerpose", input_h=64, input_w=64)
    model = create_model(cfg)
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))


class TestKeyMapping:
    def test_every_leaf_maps_uniquely(self, dlav1_variables):
        seen = {}
        for coll in ("params", "batch_stats"):
            for path, leaf in _flatten(dlav1_variables[coll]):
                tkey, _ = _torch_key_for(path, coll)
                assert tkey not in seen, f"collision: {tkey} from {path} and {seen[tkey]}"
                seen[tkey] = path
        assert len(seen) > 300  # DLA-34 has hundreds of tensors

    def test_known_reference_names_present(self, dlav1_variables):
        """Spot-check names against the reference's DLASeg state_dict layout
        (pose_dla_dcn.py module attribute names)."""
        keys = set()
        for coll in ("params", "batch_stats"):
            for path, _ in _flatten(dlav1_variables[coll]):
                tkey, _ = _torch_key_for(path, coll)
                keys.add(tkey.replace(".__OUT__.", ".3."))
        expected = [
            "base.base_layer.0.weight",
            "base.base_layer.1.running_mean",
            "base.level0.0.weight",
            "base.level1.1.running_var",
            "base.level2.tree1.conv1.weight",
            "base.level2.tree1.bn2.running_mean",
            "base.level2.root.conv.weight",
            "base.level2.project.0.weight",
            "base.level3.tree1.tree1.conv1.weight",
            "base.level3.tree2.root.bn.weight",
            "base.level5.project.1.running_mean",
            "dla_up.ida_0.proj_1.conv.weight",
            "dla_up.ida_0.proj_1.conv.conv_offset_mask.weight",
            "dla_up.ida_0.proj_1.actf.0.running_mean",
            "dla_up.ida_0.up_1.weight",
            "dla_up.ida_2.node_3.conv.bias",
            "ida_up.proj_2.conv.weight",
            "ida_up.up_2.weight",
            "convGRU.cell0.Wir.weight",
            "convGRU.cell0.Whn.weight",
            "hm.0.weight",
            "hm.1.weight",
            "hm.3.bias",
            "hps.3.weight",
            "scale.0.bias",
        ]
        for k in expected:
            assert k in keys, f"missing expected torch key {k}"

    def test_roundtrip_fills_all_leaves(self, dlav1_variables):
        rng = np.random.RandomState(0)
        sd = {}
        inverse = {}
        for coll in ("params", "batch_stats"):
            for path, leaf in _flatten(dlav1_variables[coll]):
                tkey, transform = _torch_key_for(path, coll)
                tkey = tkey.replace(".__OUT__.", ".3.")
                arr = np.asarray(leaf)
                if transform.__name__ in ("_t_conv", "_t_upconv"):
                    torch_shaped = np.transpose(
                        rng.randn(*arr.shape).astype(np.float32), (3, 2, 0, 1)
                    )
                else:
                    torch_shaped = rng.randn(*arr.shape).astype(np.float32)
                sd[tkey] = torch_shaped
                inverse[tkey] = (path, coll)

        out = convert_state_dict(sd, dlav1_variables, use_gn=True, strict=True)
        for coll in ("params", "batch_stats"):
            template = dict(_flatten(dlav1_variables[coll]))
            for path, leaf in _flatten(out[coll]):
                assert not np.array_equal(
                    np.asarray(leaf), np.asarray(template[path])
                ), f"{path} not filled"

    def test_strict_detects_missing_key(self, dlav1_variables):
        with pytest.raises(KeyError):
            convert_state_dict({}, dlav1_variables, use_gn=True, strict=True)

    def test_module_prefix_stripped(self):
        sd = strip_module_prefix({"module.a.b": 1, "c.d": 2})
        assert sd == {"a.b": 1, "c.d": 2}


class TestNumericEquivalence:
    """Validate each layout transform against torch's own ops (torch-cpu)."""

    def test_conv_transform(self):
        import torch
        import torch.nn.functional as F
        from flax import linen as nn

        rng = np.random.RandomState(0)
        x = rng.randn(1, 8, 8, 4).astype(np.float32)
        w_t = rng.randn(6, 4, 3, 3).astype(np.float32)  # OIHW
        b_t = rng.randn(6).astype(np.float32)

        y_torch = F.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(w_t),
            torch.from_numpy(b_t),
            padding=1,
        ).numpy().transpose(0, 2, 3, 1)

        from centerpose_tpu.models.convert import _t_conv

        conv = nn.Conv(6, (3, 3), padding=[(1, 1), (1, 1)])
        variables = {"params": {"kernel": jnp.asarray(_t_conv(w_t)), "bias": jnp.asarray(b_t)}}
        y_jax = np.asarray(conv.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(y_jax, y_torch, atol=1e-4)

    def test_upsample_transform(self):
        import torch

        rng = np.random.RandomState(1)
        c, f = 3, 2
        x = rng.randn(1, 4, 4, c).astype(np.float32)
        up = torch.nn.ConvTranspose2d(c, c, f * 2, stride=f, padding=f // 2,
                                      groups=c, bias=False)
        w_t = rng.randn(c, 1, f * 2, f * 2).astype(np.float32)
        up.weight.data = torch.from_numpy(w_t)
        y_torch = up(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        y_torch = y_torch.transpose(0, 2, 3, 1)

        from centerpose_tpu.models.convert import _t_upconv
        from centerpose_tpu.models.layers import UpsampleConv

        m = UpsampleConv(f)
        variables = {"params": {"kernel": jnp.asarray(_t_upconv(w_t))}}
        y_jax = np.asarray(m.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(y_jax, y_torch, atol=1e-4)

    def test_batchnorm_transform(self):
        import torch

        rng = np.random.RandomState(2)
        c = 5
        x = rng.randn(2, 4, 4, c).astype(np.float32)
        bn = torch.nn.BatchNorm2d(c, momentum=0.1, eps=1e-5).eval()
        bn.weight.data = torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5)
        bn.bias.data = torch.from_numpy(rng.randn(c).astype(np.float32))
        bn.running_mean.data = torch.from_numpy(rng.randn(c).astype(np.float32))
        bn.running_var.data = torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5)
        y_torch = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        y_torch = y_torch.transpose(0, 2, 3, 1)

        from flax import linen as nn

        m = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
        variables = {
            "params": {
                "scale": jnp.asarray(bn.weight.detach().numpy()),
                "bias": jnp.asarray(bn.bias.detach().numpy()),
            },
            "batch_stats": {
                "mean": jnp.asarray(bn.running_mean.numpy()),
                "var": jnp.asarray(bn.running_var.numpy()),
            },
        }
        y_jax = np.asarray(m.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(y_jax, y_torch, atol=1e-4)
