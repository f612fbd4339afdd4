"""ConvLSTM gate update: sigmoid/tanh/elementwise fusion.

Reference recurrence (src/convlstm.py:5-19): gates = Conv(cat(x, h));
i, f, o = sigmoid; g = tanh; c' = f*c + i*g; h' = o*tanh(c').

The conv itself belongs to XLA (MXU conv). The gate math is bandwidth-bound
elementwise work; a Pallas kernel fuses the 4-way split + 5 nonlinearities +
2 FMAs into one VMEM pass. XLA's fusion already does well here, so the kernel
is benchmark-gated (CLIMATE_TPU_LSTM_GATES=pallas|xla to force).

Gate order i, f, o, g matches the torch chunk order (src/convlstm.py:14).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _xla_gates(gates, c):
    i, f, o, g = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_next = f * c + i * g
    h_next = o * jnp.tanh(c_next)
    return h_next, c_next


def convlstm_gates(gates, c):
    """gates: (..., 4*C) pre-activation; c: (..., C) cell state -> (h', c')."""
    if os.environ.get("CLIMATE_TPU_LSTM_GATES") == "pallas":
        try:
            platform = jax.devices()[0].platform
        except RuntimeError:
            platform = "cpu"
        if platform == "tpu":
            from .convlstm_gates_pallas import fused_gates

            return fused_gates(gates, c)
    return _xla_gates(gates, c)
