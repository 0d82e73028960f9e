"""Convolutional GRU used to chain head groups ("easier tasks inform harder tasks").

Parity target: `ConvGRUCell`/`ConvGRU` (src/lib/models/networks/convGRU.py:7-94).
Cell equations (the reference's br/bz/bin/bhn tensors are zero-initialized
*constants*, never registered as parameters — convGRU.py:41-51 — so they are omitted
here; Wi* convs carry bias, Wh* convs do not):

    r_t = sigmoid(Wir(x) + Whr(h))
    z_t = sigmoid(Wiz(x) + Whz(h))
    n_t = tanh(Win(x) + r_t * Whn(h))
    h_t = (1 - z_t) * n_t + z_t * h_{t-1}

The reference iterates the cell `step` times feeding the SAME spatial feature x each
step (convGRU.py:72-94). TPU shaping (exact — pure linearity, parameter tree
unchanged):
  * the three input projections Wir/Wiz/Win are computed ONCE for all steps
    (x never changes) as a single fused Cin->3H conv;
  * the three hidden convs Whr/Whz/Whn fuse into one Cin->3H conv per step —
    Whn(h) does not depend on r (r scales its OUTPUT), so all three share h.
  A lone 64-lane conv idles half the MXU; the fused 192-lane conv does not,
  and h is read once per step instead of three times.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class _ConvParam(nn.Module):
    """Declares nn.Conv-compatible params ('kernel' [+ 'bias']) and returns them."""

    use_bias: bool = False

    @nn.compact
    def __call__(self, shape):
        k = self.param("kernel", nn.initializers.lecun_normal(), tuple(shape))
        b = (
            self.param("bias", nn.initializers.zeros, (shape[-1],))
            if self.use_bias
            else None
        )
        return k, b


class ConvGRUCell(nn.Module):
    hidden: int = 64
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.Wir = _ConvParam(True)
        self.Wiz = _ConvParam(True)
        self.Win = _ConvParam(True)
        self.Whr = _ConvParam()
        self.Whz = _ConvParam()
        self.Whn = _ConvParam()

    def _kernels(self, in_ch: int):
        """Per-gate parameters (reference names/shapes), fused along Cout as
        [r | z | n]."""
        kk = (self.kernel, self.kernel)
        wi, bi, wh = [], [], []
        for wim, whm in ((self.Wir, self.Whr), (self.Wiz, self.Whz),
                         (self.Win, self.Whn)):
            k, b = wim(kk + (in_ch, self.hidden))
            wi.append(k)
            bi.append(b)
            k, _ = whm(kk + (self.hidden, self.hidden))
            wh.append(k)
        return (
            jnp.concatenate(wi, axis=-1),
            jnp.concatenate(bi, axis=-1),
            jnp.concatenate(wh, axis=-1),
        )

    def _conv(self, x, w):
        pad = self.kernel // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (1, 1),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def input_proj(self, x):
        """[B,H,W,Cin] -> fused [B,H,W,3H] input projection (bias included) —
        loop-invariant across GRU steps."""
        wi, bi, _ = self._kernels(x.shape[-1])
        return self._conv(x, wi) + bi.astype(self.dtype)

    def __call__(self, x, h, xp=None):
        hh = self.hidden
        if xp is None:
            xp = self.input_proj(x)
        _, _, wh = self._kernels(x.shape[-1])
        hp = self._conv(h, wh)
        r = jax.nn.sigmoid(xp[..., :hh] + hp[..., :hh])
        z = jax.nn.sigmoid(xp[..., hh:2 * hh] + hp[..., hh:2 * hh])
        n = jnp.tanh(xp[..., 2 * hh:] + r * hp[..., 2 * hh:])
        return (1.0 - z) * n + z * h.astype(self.dtype)


class ConvGRU(nn.Module):
    """Fixed-step ConvGRU over a constant input feature.

    Returns the stacked per-step hidden states, shape [steps, B, H, W, hidden].
    """

    steps: int = 3
    hidden: int = 64
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cell = ConvGRUCell(
            self.hidden, self.kernel, dtype=self.dtype, name="cell0"
        )
        h = jnp.zeros(x.shape[:3] + (self.hidden,), dtype=x.dtype)

        xp = cell.input_proj(x)  # shared by every step (x is constant)
        # Unrolled (steps is 3 or 4): XLA fuses fine and scan-over-shared-params
        # would block per-step head routing anyway.
        outputs = []
        for _ in range(self.steps):
            h = cell(x, h, xp=xp)
            outputs.append(h)
        return jnp.stack(outputs, axis=0)
