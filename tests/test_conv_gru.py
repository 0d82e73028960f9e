"""ConvGRU cell semantics vs a hand-rolled numpy reference (convGRU.py:32-39)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centerpose_tpu.models.conv_gru import ConvGRU, ConvGRUCell


def _conv_np(x, k, bias=None):
    """3x3 same-pad cross-correlation, NHWC/HWIO, minimal numpy reference."""
    h, w, cin = x.shape
    kh, kw, _, cout = k.shape
    xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
    out = np.zeros((h, w, cout))
    for i in range(kh):
        for j in range(kw):
            out += xp[i : i + h, j : j + w] @ k[i, j]
    if bias is not None:
        out += bias
    return out


class TestConvGRUCell:
    def test_matches_numpy_reference(self):
        rng = np.random.RandomState(0)
        x = rng.randn(1, 6, 6, 4).astype(np.float32)
        h0 = rng.randn(1, 6, 6, 4).astype(np.float32)

        cell = ConvGRUCell(hidden=4, kernel=3)
        variables = cell.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(h0))
        got = np.asarray(cell.apply(variables, jnp.asarray(x), jnp.asarray(h0)))

        p = variables["params"]

        def k(name):
            return np.asarray(p[name]["kernel"])

        def b(name):
            return np.asarray(p[name]["bias"])

        def sigmoid(v):
            return 1.0 / (1.0 + np.exp(-v))

        r = sigmoid(_conv_np(x[0], k("Wir"), b("Wir")) + _conv_np(h0[0], k("Whr")))
        z = sigmoid(_conv_np(x[0], k("Wiz"), b("Wiz")) + _conv_np(h0[0], k("Whz")))
        n = np.tanh(
            _conv_np(x[0], k("Win"), b("Win")) + r * _conv_np(h0[0], k("Whn"))
        )
        want = (1 - z) * n + z * h0[0]
        np.testing.assert_allclose(got[0], want, atol=1e-4)

    def test_unroll_states_differ_and_bounded(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
        gru = ConvGRU(steps=3, hidden=4)
        variables = gru.init(jax.random.PRNGKey(0), x)
        states = np.asarray(gru.apply(variables, x))
        assert states.shape == (3, 1, 8, 8, 4)
        assert not np.allclose(states[0], states[1])
        # h stays in tanh range as h0=0 and updates interpolate towards n.
        assert np.abs(states).max() <= 1.0 + 1e-5

    def test_gradients_flow_through_steps(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
        gru = ConvGRU(steps=3, hidden=4)
        variables = gru.init(jax.random.PRNGKey(0), x)

        def loss(v, x):
            return jnp.sum(gru.apply(v, x)[2] ** 2)

        grads = jax.grad(loss)(variables, x)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
