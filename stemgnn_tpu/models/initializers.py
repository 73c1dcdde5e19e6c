"""Torch-distribution-compatible initializers.

The 1%-MAE parity bar (BASELINE.md) requires matching the reference's
*init distributions* (not its exact RNG draws): xavier_uniform with gain
1.414 for the attention vectors (base_model.py:88-91), xavier_normal for
the block contraction weight (base_model.py:26), torch's default
kaiming-uniform(a=sqrt(5)) for every nn.Linear, and uniform(-1/sqrt(H),
1/sqrt(H)) for all GRU weights/biases (torch nn.GRU default).

torch fan computation for an ND tensor (torch.nn.init._calculate_fan_in_and_fan_out):
    receptive = prod(shape[2:]);  fan_in = shape[1]*receptive;  fan_out = shape[0]*receptive
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _torch_fans(shape) -> tuple[int, int]:
    receptive = 1
    for d in shape[2:]:
        receptive *= d
    return shape[1] * receptive, shape[0] * receptive


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ on a torch-layout tensor of `shape`."""
    fan_in, fan_out = _torch_fans(shape)
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def xavier_normal(key, shape, gain: float = 1.0, dtype=jnp.float32):
    """torch.nn.init.xavier_normal_ on a torch-layout tensor of `shape`."""
    fan_in, fan_out = _torch_fans(shape)
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def linear_params(key, in_features: int, out_features: int, dtype=jnp.float32):
    """torch nn.Linear default init.

    torch stores weight as [out, in] and draws kaiming_uniform(a=sqrt(5)),
    which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias likewise.
    We store the weight transposed ([in, out]) for `x @ w + b`.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    w = jax.random.uniform(kw, (in_features, out_features), dtype, -bound, bound)
    b = jax.random.uniform(kb, (out_features,), dtype, -bound, bound)
    return {"w": w, "b": b}


def uniform_scaled(key, shape, hidden_size: int, dtype=jnp.float32):
    """torch RNN default init: U(-1/sqrt(H), 1/sqrt(H)) (nn.GRU.reset_parameters)."""
    bound = 1.0 / math.sqrt(hidden_size)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
