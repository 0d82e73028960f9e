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
step (convGRU.py:72-94); step-t hidden states are routed to head group t. Here the
unroll is a fixed-length `lax.scan` over shared cell parameters inside one jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvGRUCell(nn.Module):
    hidden: int = 64
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h):
        pad = [(self.kernel // 2, self.kernel // 2)] * 2

        def conv(name, use_bias):
            return nn.Conv(
                self.hidden,
                (self.kernel, self.kernel),
                padding=pad,
                use_bias=use_bias,
                dtype=self.dtype,
                name=name,
            )

        r = jax.nn.sigmoid(conv("Wir", True)(x) + conv("Whr", False)(h))
        z = jax.nn.sigmoid(conv("Wiz", True)(x) + conv("Whz", False)(h))
        n = jnp.tanh(conv("Win", True)(x) + r * conv("Whn", False)(h))
        return (1.0 - z) * n + z * h


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
        cell = ConvGRUCell(self.hidden, self.kernel, dtype=self.dtype, name="cell0")
        h = jnp.zeros(x.shape[:3] + (self.hidden,), dtype=x.dtype)

        # Unrolled (steps is 3 or 4): XLA fuses fine and scan-over-shared-params
        # would block per-step head routing anyway.
        outputs = []
        for _ in range(self.steps):
            h = cell(x, h)
            outputs.append(h)
        return jnp.stack(outputs, axis=0)
