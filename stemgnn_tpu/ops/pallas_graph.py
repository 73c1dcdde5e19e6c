"""Pallas kernel for the Chebyshev-Laplacian graph convolution.

Reference semantics: base_model.py:62-64 — gfted = mul_L[K,N,N] @ x,
with mul_L the Chebyshev stack whose k=0 term is identically ZERO
(base_model.py:129: first_laplacian = zeros — reference quirk).

TPU-first design: x [B,N,W] is reshaped to a single [N, B*W] operand so
each Chebyshev order is one [TM,N] x [N,TC] MXU matmul tile; the k=0
all-zero matmul is skipped entirely (the jnp twin multiplies by zeros —
25% of the graph-conv FLOPs for free) and its output slab is filled by
XLA's (fused) zero broadcast. Grid: (order k in {1,2,3}, row tile, col
tile); the full N contraction stays in VMEM (N <= ~512 per shard; larger
graphs run node-block sharded so each shard sees its row block only).

Backward: custom_vjp via the jnp twin's VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stemgnn_tpu.ops import jnp_impl

ROW_TILE = 128
COL_TILE = 512


def _kernel(l_ref, x_ref, out_ref):
    out_ref[:] = jnp.dot(l_ref[:][0], x_ref[:], preferred_element_type=jnp.float32)[
        None
    ]


def _forward(mul_L, x, compute_dtype=jnp.float32):
    k, n, _ = mul_L.shape
    b, _, w = x.shape
    xt = jnp.transpose(x, (1, 0, 2)).reshape(n, b * w)  # [N, B*W]
    pad_r = -n % ROW_TILE
    pad_c = -(b * w) % COL_TILE
    lk = jnp.pad(mul_L[1:], ((0, 0), (0, pad_r), (0, 0)))  # skip k=0 (zeros)
    xp = jnp.pad(xt, ((0, 0), (0, pad_c)))
    if compute_dtype != jnp.float32:
        # bf16 MXU operands, f32 accumulation (preferred_element_type)
        lk, xp = lk.astype(compute_dtype), xp.astype(compute_dtype)
    rows, cols = n + pad_r, b * w + pad_c

    out = pl.pallas_call(
        _kernel,
        grid=(k - 1, rows // ROW_TILE, cols // COL_TILE),
        in_specs=[
            pl.BlockSpec((1, ROW_TILE, n), lambda ki, ri, ci: (ki, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, COL_TILE), lambda ki, ri, ci: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_TILE, COL_TILE), lambda ki, ri, ci: (ki, ri, ci),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((k - 1, rows, cols), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * (k - 1) * rows * n * cols,
            bytes_accessed=4 * ((k - 1) * rows * n + n * cols + (k - 1) * rows * cols),
            transcendentals=0,
        ),
    )(lk, xp)
    out = out[:, :n, : b * w].reshape(k - 1, n, b, w)
    out = jnp.transpose(out, (2, 0, 1, 3))  # [B, K-1, N, W]
    zero = jnp.zeros((b, 1, n, w), out.dtype)
    return jnp.concatenate([zero, out], axis=1)  # [B, K, N, W], k=0 slab zero


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cheb_graph_conv_pallas(mul_L, x, compute_dtype=jnp.float32):
    """Pallas twin of jnp_impl.cheb_graph_conv: [K,N,N],[B,N,W] -> [B,K,N,W].

    compute_dtype=bfloat16: bf16 MXU operands with f32 accumulation."""
    return _forward(mul_L, x, compute_dtype)


def _fwd(mul_L, x, compute_dtype):
    return _forward(mul_L, x, compute_dtype), (mul_L, x)


def _bwd(compute_dtype, res, g):
    mul_L, x = res
    _, vjp = jax.vjp(jnp_impl.cheb_graph_conv, mul_L, x)
    return vjp(g)


cheb_graph_conv_pallas.defvjp(_fwd, _bwd)
