"""Pallas kernel for the latent-correlation attention (SDDMM).

Reference semantics: base_model.py:151-162 — rank-1 additive scores
score[b,i,j] = key[b,i] + query[b,j], LeakyReLU(alpha), row softmax.

TPU-first design: the [B,N,N] score matrix is never materialized in HBM
pre-softmax. The kernel fuses score construction + LeakyReLU + a
numerically-stable row softmax per (batch, row-tile) grid cell, keeping
the [TR, N] tile in VMEM. The rank-1 projections key/query (= enc @ w,
an [N,1] matvec) are computed outside — they are O(B*N) and feed two
separate broadcast axes.

Backward: custom_vjp via the jnp twin's VJP (see pallas_spectral.py for
the rationale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 128


def _kernel(alpha_ref, key_ref, query_ref, out_ref):
    alpha = alpha_ref[0]
    # key block [1, TR, 1], query block [1, 1, N] -> scores [TR, N]
    scores = key_ref[:][0] + query_ref[:][0]  # [TR,1] + [1,N]
    scores = jnp.where(scores >= 0, scores, alpha * scores)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    out_ref[:] = (e / jnp.sum(e, axis=-1, keepdims=True))[None]  # [1, TR, N]


def _forward_kq(key, query, alpha: float):
    b, n = key.shape
    pad = -n % ROW_TILE
    key_p = jnp.pad(key, ((0, 0), (0, pad)))[..., None]  # [B, rows, 1]
    query_p = query[:, None, :]  # [B, 1, N]
    rows = n + pad
    alpha_arr = jnp.full((1,), alpha, dtype=jnp.float32)

    out = pl.pallas_call(
        _kernel,
        grid=(b, rows // ROW_TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ROW_TILE, 1), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_TILE, n), lambda bi, ri: (bi, ri, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows, n), jnp.float32),
    )(alpha_arr, key_p, query_p)
    return out[:, :n, :]


def _bwd_kernel(alpha_ref, key_ref, query_ref, p_ref, g_ref, dkey_ref, dquery_ref):
    """Fused softmax+LeakyReLU+rank-1-score backward.

    Per (batch, row-tile) grid cell: dscores never leaves VMEM — the only
    HBM outputs are the rank-1 reductions dkey [TR] and dquery [N] (the
    scores depend on key/query alone). dquery accumulates across row
    tiles (constant output block per batch; sequential grid)."""
    alpha = alpha_ref[0]
    p = p_ref[:][0]  # [TR, N] softmax output (fwd residual)
    g = g_ref[:][0]
    gp = g * p
    # softmax bwd: dl = p * (g - rowsum(g*p))
    dl = gp - p * jnp.sum(gp, axis=-1, keepdims=True)
    # LeakyReLU bwd needs only the PRE-activation sign: recompute the
    # rank-1 score key_i + query_j in VMEM
    pre = key_ref[:][0] + query_ref[:][0]  # [TR,1] + [1,N]
    dpre = jnp.where(pre >= 0, dl, alpha * dl)
    # outputs are [B, 1, rows]/[B, 1, N] (the singleton keeps the block's
    # last-two-dims Mosaic-legal: (1, TR)/(1, N) with dim -2 == array dim)
    dkey_ref[:] = jnp.sum(dpre, axis=-1)[None, None]  # [1, 1, TR]
    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _init():
        dquery_ref[:] = jnp.sum(dpre, axis=0)[None, None]

    @pl.when(ri != 0)
    def _acc():
        dquery_ref[:] += jnp.sum(dpre, axis=0)[None, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def attention_kq_pallas(key, query, alpha: float):
    """Pallas twin of jnp_impl.attention_from_kq: fused rank-1 score +
    LeakyReLU + row softmax from the [B, N] projections. Production
    computes key/query with post-scan matmuls on the GRU encoding
    (models/stemgnn.py) and feeds them here; the in-scan kq fusion
    (gru_kq_over_nodes) that would avoid materializing the encoding was
    measured 45% slower composed and is kept only as a tested
    experiment (round-3 A/B, CLAUDE.md)."""
    return _forward_kq(key, query, alpha)


def _fwd(key, query, alpha):
    out = _forward_kq(key, query, alpha)
    return out, (key, query, out)


def _bwd(alpha, res, g):
    key, query, p = res
    b, n = key.shape
    pad = -n % ROW_TILE
    rows = n + pad
    key_p = jnp.pad(key, ((0, 0), (0, pad)))[..., None]
    query_p = query[:, None, :]
    # zero-padded rows of p/g contribute zero to every grad
    p_p = jnp.pad(p, ((0, 0), (0, pad), (0, 0)))
    g_p = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    alpha_arr = jnp.full((1,), alpha, dtype=jnp.float32)

    dkey, dquery = pl.pallas_call(
        _bwd_kernel,
        grid=(b, rows // ROW_TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ROW_TILE, 1), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_TILE, n), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_TILE, n), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ROW_TILE), lambda bi, ri: (bi, 0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, rows), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ],
    )(alpha_arr, key_p, query_p, p_p, g_p)
    return dkey[:, 0, :n], dquery[:, 0]


attention_kq_pallas.defvjp(_fwd, _bwd)


def attention_adjacency_pallas(enc, weight_key, weight_query, alpha: float):
    """Pallas twin of jnp_impl.attention_adjacency (enc-based API kept for
    the kernel-equivalence tests and any [B, N, N]-encoding caller). The
    rank-1 projections stay in XLA; jax autodiff differentiates them
    around the custom-vjp kq core (d enc = dkey (x) wk + dquery (x) wq)."""
    key = (enc @ weight_key)[..., 0]  # [B, N]
    query = (enc @ weight_query)[..., 0]
    return attention_kq_pallas(key, query, alpha)
