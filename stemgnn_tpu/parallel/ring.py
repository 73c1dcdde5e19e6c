"""Ring-partitioned latent attention over the 'graph' mesh axis.

For node counts where the [N, N] attention fits per-device, the GSPMD
constraint path (parallel/train.py) is enough. For large N (the 100k-node
stretch config of BASELINE.json), each device holds only its node block
of keys/queries and its row block [B, N/P, N] of the output; the softmax
denominator needs every query block, so query blocks rotate around the
ring ('graph' axis over ICI) with `jax.lax.ppermute` while each device
accumulates an ONLINE max/sum (flash-attention-style streaming softmax,
two phases):

  phase 1: P ring steps — running row max m and rescaled exp-sum s
  phase 2: P ring steps — emit each [B, Nl, Nl] column block normalized
           by the final (m, s), written at the rotated column offset

The rank-1 additive score (score = key_i + query_j, base_model.py:156)
makes each step O(B * Nl^2) elementwise — no matmul — so the ring is
bandwidth-dominated and overlaps trivially with the next permute.

This module is pure shard_map/collective code: it must match the dense
jnp twin exactly (tests/test_ring.py, 8-device CPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stemgnn_tpu.parallel.mesh import GRAPH_AXIS


def _leaky(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _ring_attention_local(key_blk, query_blk, alpha, axis_name):
    """Per-shard body. key_blk/query_blk: [B, Nl] local node blocks.

    Returns the local row block [B, Nl, N] of the row-softmaxed attention
    (columns in GLOBAL node order).
    """
    p = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    b, nl = key_blk.shape
    perm = [(i, (i + 1) % p) for i in range(p)]  # send right

    # ---- phase 1: online max / sum over all column blocks ----
    def phase1(carry, _):
        q, m, s = carry
        scores = _leaky(key_blk[:, :, None] + q[:, None, :], alpha)  # [B,Nl,Nl]
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(scores - m_new[:, :, None]), axis=-1
        )
        q = jax.lax.ppermute(q, axis_name, perm)
        return (q, m_new, s), None

    # derive the carries from key_blk so they are typed as varying over the
    # ring axis (shard_map's scan requires carry in/out types to match)
    m0 = jnp.full_like(key_blk, -jnp.inf)
    s0 = jnp.zeros_like(key_blk)
    (q_back, m, s), _ = jax.lax.scan(phase1, (query_blk, m0, s0), None, length=p)

    # ---- phase 2: emit normalized blocks at global column offsets ----
    # after p permutes the query block is back home; at step t we hold the
    # block owned by device (my - t) mod p
    def phase2(carry, t):
        q, out = carry
        scores = _leaky(key_blk[:, :, None] + q[:, None, :], alpha)
        blk = jnp.exp(scores - m[:, :, None]) / s[:, :, None]
        col_owner = (my - t) % p
        out = jax.lax.dynamic_update_slice(
            out, blk, (0, 0, col_owner * nl)
        )
        q = jax.lax.ppermute(q, axis_name, perm)
        return (q, out), None

    out0 = jax.lax.pcast(
        jnp.zeros((b, nl, nl * p), key_blk.dtype), (axis_name,), to="varying"
    )
    (_, out), _ = jax.lax.scan(phase2, (q_back, out0), jnp.arange(p))
    return out


def ring_attention_kq(mesh: Mesh, key, query, alpha: float):
    """Ring attention from precomputed [B, N] projections (production
    computes them with post-scan matmuls on the GRU encoding).

    Returns [B, N, N] row-softmax attention, row-block sharded over
    'graph'. N must be divisible by the 'graph' axis size.
    """
    n = key.shape[1]
    p = mesh.shape[GRAPH_AXIS]
    if n % p:
        raise ValueError(f"N={n} not divisible by graph axis {p}")

    fn = jax.shard_map(
        partial(_ring_attention_local, alpha=alpha, axis_name=GRAPH_AXIS),
        mesh=mesh,
        in_specs=(P(None, GRAPH_AXIS), P(None, GRAPH_AXIS)),
        out_specs=P(None, GRAPH_AXIS, None),
    )
    return fn(key, query)


def ring_attention(mesh: Mesh, enc, weight_key, weight_query, alpha: float):
    """Sharded twin of ops.attention_adjacency (enc-based API, kept for
    tests and [B, N, N]-encoding callers).

    enc: [B, N, N] (the GRU encoding, already transposed as the reference's
    permute(0,2,1)); returns [B, N, N] row-softmax attention, row-block
    sharded over 'graph'. N must be divisible by the 'graph' axis size.
    """
    # rank-1 projections: key over rows, query over rows (both node-sharded)
    key = (enc @ weight_key)[..., 0]  # [B, N]
    query = (enc @ weight_query)[..., 0]
    return ring_attention_kq(mesh, key, query, alpha)
