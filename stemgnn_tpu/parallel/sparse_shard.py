"""Node-sharded sparse latent graph over the 'graph' mesh axis.

Composes the two large-N paths that previously existed separately
(ROADMAP item 4): the top-k sparse latent graph (ops/sparse.py — O(N·k)
storage, feature-space Chebyshev) and node-block partitioning over the
'graph' axis (parallel/ring.py). Each device holds only its row block of
the rectangular column-block matrix C [Nl, k]; nothing [N, N]- or even
[N, k]-shaped is ever materialized on one device, so the 100k-node
stretch config fits: per-device state is O(Nl·k + k·W).

Collective structure (all on the 'graph' axis, i.e. ICI rings):
- graph build: distributed top-k — local `lax.top_k` of the [Nl] query
  block, `all_gather` of the P·k (value, index) candidates, global top-k
  of the candidates. Any global top-k element is necessarily in its own
  shard's local top-k, so this is exact, not approximate.
- A·x: every row of A only reads the k selected columns, so one psum
  assembles x[idx] ([k, W], the only globally-shared activation) and the
  product is a local [Nl, k] x [k, W] MXU matmul.
- Aᵀ·x: local Cᵀ·x_blk partial ([k, W]) + psum, scattered back into the
  rows of idx that live on this device (masked scatter-add; out-of-block
  entries contribute zero).

Semantics are identical to ops/sparse.py (same reference quirks: row
softmax over selected columns, pre-symmetrization degree base_model.py:141,
A ← ½(A+Aᵀ) :143, D̂ = diag(1/(√deg+1e-7)) :145, T0 = 0 zeroing the k=0
Chebyshev branch :129) — pinned by tests/test_sparse_shard.py against the
single-device sparse path on the 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from stemgnn_tpu.ops.sparse import SparseLatentGraph
from stemgnn_tpu.parallel.mesh import DATA_AXIS, GRAPH_AXIS


def _local_block_meta(idx, nl, axis_name):
    """Positions of the global column set `idx` inside this device's row
    block: (safe local positions [k], membership mask [k])."""
    my = jax.lax.axis_index(axis_name)
    pos = idx - my * nl
    mask = (pos >= 0) & (pos < nl)
    return jnp.clip(pos, 0, nl - 1), mask


def _build_graph_local(key_blk, query_blk, alpha, k, axis_name,
                       dropout_rng=None, dropout_rate=0.0):
    """Per-shard graph build. key_blk/query_blk: [Nl]. Returns a
    SparseLatentGraph whose c/degree/inv_sqrt hold only the local row
    block (idx is replicated — identical on every device)."""
    nl = query_blk.shape[0]
    # exact distributed top-k over the global query vector
    vals, locs = jax.lax.top_k(query_blk, min(k, nl))
    my = jax.lax.axis_index(axis_name)
    cand_vals = jax.lax.all_gather(vals, axis_name, tiled=True)  # [P*min(k,Nl)]
    cand_idx = jax.lax.all_gather(locs + my * nl, axis_name, tiled=True)
    top_vals, sel = jax.lax.top_k(cand_vals, k)
    idx = cand_idx[sel]  # [k], same on every device
    # local row block of the rectangular score matrix (ops/sparse.py:72-74)
    scores = key_blk[:, None] + top_vals[None, :]  # query[idx] == top_vals
    scores = jax.nn.leaky_relu(scores, negative_slope=alpha)
    c = jax.nn.softmax(scores, axis=-1)  # [Nl, k]
    if dropout_rate > 0.0 and dropout_rng is not None:
        # BITWISE-identical dropout to the single-device build: every
        # shard draws the same global [N, k] mask (same rng, same shape
        # as ops/sparse.py:77) and slices its own row block. The mask is
        # bools — N*k bits even at the 100k stretch is ~6 Mbit, trivial —
        # and keeping the stream identical makes sharded-vs-single train
        # steps loss-EQUAL (dryrun / tests assert it).
        keep = 1.0 - dropout_rate
        n_total = nl * jax.lax.axis_size(axis_name)
        full_mask = jax.random.bernoulli(dropout_rng, keep, (n_total, k))
        mask = jax.lax.dynamic_slice_in_dim(full_mask, my * nl, nl, axis=0)
        c = jnp.where(mask, c / keep, 0.0)
    degree = jnp.sum(c, axis=1)  # pre-symmetrization (base_model.py:141)
    inv_sqrt = 1.0 / (jnp.sqrt(degree) + 1e-7)
    return SparseLatentGraph(idx=idx, c=c, degree=degree, inv_sqrt=inv_sqrt)


def _gather_selected_rows(y_blk, idx, axis_name):
    """y[idx] for node-sharded y: [..., Nl, W] -> [..., k, W] (one psum)."""
    nl = y_blk.shape[-2]
    pos, mask = _local_block_meta(idx, nl, axis_name)
    contrib = jnp.where(
        mask[:, None], jnp.take(y_blk, pos, axis=-2), 0.0
    )
    return jax.lax.psum(contrib, axis_name)


def _apply_sym_adjacency_local(g: SparseLatentGraph, x_blk, axis_name):
    """Local row block of ½(A + Aᵀ)·x (sharded twin of ops/sparse.py:84-94)."""
    nl = x_blk.shape[-2]
    x_sel = _gather_selected_rows(x_blk, g.idx, axis_name)  # [..., k, W]
    ax = jnp.einsum("nk,...kw->...nw", g.c, x_sel)  # [..., Nl, W]
    ct = jax.lax.psum(
        jnp.einsum("kn,...nw->...kw", g.c.T, x_blk), axis_name
    )  # [..., k, W] = Aᵀx restricted to rows idx (all other rows are 0)
    pos, mask = _local_block_meta(g.idx, nl, axis_name)
    atx = jnp.zeros_like(x_blk).at[..., pos, :].add(
        jnp.where(mask[:, None], ct, 0.0)
    )
    return 0.5 * (ax + atx)


def _laplacian_apply_local(g: SparseLatentGraph, x_blk, axis_name):
    """Local row block of L·x, L = D̂(D − A_sym)D̂ (base_model.py:144-147)."""
    s = g.inv_sqrt[:, None]
    xs = s * x_blk
    return s * (
        g.degree[:, None] * xs - _apply_sym_adjacency_local(g, xs, axis_name)
    )


def _cheb_conv_local(g: SparseLatentGraph, x_blk, axis_name):
    """[., Nl, W] -> [., 4, Nl, W]: T0=0, t1=Lx, t2=2L t1, t3=2L t2 − t1
    (the reference's nonstandard recursion, base_model.py:129-133)."""
    t0 = jnp.zeros_like(x_blk)
    t1 = _laplacian_apply_local(g, x_blk, axis_name)
    t2 = 2.0 * _laplacian_apply_local(g, t1, axis_name) - t0
    t3 = 2.0 * _laplacian_apply_local(g, t2, axis_name) - t1
    return jnp.stack([t0, t1, t2, t3], axis=1)


# ---------------------------------------------------------------------------
# mesh-level entry points (shard_map wrappers)
# ---------------------------------------------------------------------------


def build_sharded_graph(mesh: Mesh, key_vec, query_vec, alpha: float, k: int,
                        *, dropout_rng=None, dropout_rate: float = 0.0
                        ) -> SparseLatentGraph:
    """Distributed twin of ops.sparse.topk_latent_graph.

    key_vec/query_vec: [N] (batch-meaned rank-1 projections). Returns a
    SparseLatentGraph whose c [N, k] / degree [N] / inv_sqrt [N] are
    row-sharded over 'graph' and idx [k] is replicated.
    """
    n = key_vec.shape[0]
    p = mesh.shape[GRAPH_AXIS]
    if n % p:
        raise ValueError(f"N={n} not divisible by graph axis {p}")
    if k > n:
        raise ValueError(f"k={k} > N={n}")
    fn = jax.shard_map(
        partial(_build_graph_local, alpha=alpha, k=k, axis_name=GRAPH_AXIS,
                dropout_rng=dropout_rng, dropout_rate=dropout_rate),
        mesh=mesh,
        in_specs=(P(GRAPH_AXIS), P(GRAPH_AXIS)),
        out_specs=SparseLatentGraph(
            idx=P(), c=P(GRAPH_AXIS, None), degree=P(GRAPH_AXIS),
            inv_sqrt=P(GRAPH_AXIS),
        ),
        check_vma=False,  # idx/top_vals are provably replicated (all_gather
        # + pure fns of it); check_vma can't see through the value identity
    )
    return fn(key_vec, query_vec)


def sharded_sparse_cheb_conv(mesh: Mesh, g: SparseLatentGraph, x):
    """Distributed twin of ops.sparse.sparse_cheb_conv.

    x: [B, N, W] with N sharded over 'graph' (B over 'data'). Returns
    [B, 4, N, W] with the same sharding.
    """
    fn = jax.shard_map(
        partial(_cheb_conv_local, axis_name=GRAPH_AXIS),
        mesh=mesh,
        in_specs=(
            SparseLatentGraph(
                idx=P(), c=P(GRAPH_AXIS, None), degree=P(GRAPH_AXIS),
                inv_sqrt=P(GRAPH_AXIS),
            ),
            P(DATA_AXIS, GRAPH_AXIS, None),
        ),
        out_specs=P(DATA_AXIS, None, GRAPH_AXIS, None),
        check_vma=False,
    )
    return fn(g, x)
