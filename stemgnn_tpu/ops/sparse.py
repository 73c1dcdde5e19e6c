"""Sparse top-k latent graph for the large-N stretch config.

Why this exists (SURVEY.md §7 hard part (d)): the reference's latent graph
is a DENSE row-softmax [N, N] attention (base_model.py:151-162) and its
Chebyshev stack materializes L² and L³ (base_model.py:121-134) — O(N²)
memory and O(N³) compute. Fine for N ≤ 358; impossible for the 100k-node
stretch config of BASELINE.json. This module is the TPU-native large-N
path:

1. **Rank-1-aware top-k.** The reference's score is additive rank-1:
   score[i, j] = LeakyReLU(key_i + query_j) (base_model.py:156-158).
   LeakyReLU is strictly monotone, so for EVERY row i the top-k columns
   are the top-k entries of `query` — one global `jax.lax.top_k` of an
   [N] vector, not N row-wise selections. The sparse adjacency is a
   rectangular column block C = softmax_rows(scores[:, idx]) with a
   single shared column-index set idx [k]: storage O(N·k), and every op
   on it is a dense [N, k]-shaped MXU matmul (no gather/scatter in the
   hot loop beyond one `take`/`scatter` per application).

2. **Feature-space Chebyshev.** Instead of materializing T2 = 2L²,
   T3 = 4L³ − L (impossible at scale), apply the SAME recursion to the
   features: t1 = L·x, t2 = 2L·t1, t3 = 2L·t2 − t1. With dense L this is
   algebraically identical to the reference's materialized stack
   (tests/test_sparse.py pins sparse(k=N) == dense path).

3. **Batch-meaned scores.** The dense path softmaxes per batch element
   and means the [B, N, N] attention (base_model.py:140). A per-sample
   top-k support would differ across the batch; the sparse path instead
   means key/query over the batch BEFORE the softmax — a documented
   stretch-config approximation (exact when B == 1).

Semantics kept from the reference: softmax over the (selected) columns,
degree from the asymmetric matrix BEFORE symmetrization
(base_model.py:141), A ← ½(A + Aᵀ) (:143), L = D̂(D − A)D̂ with
D̂ = diag(1/(√deg + 1e-7)) (:144-147), and T0 = 0 zeroing the k=0 branch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SparseLatentGraph(NamedTuple):
    """Column-block sparse symmetric-normalized latent graph.

    The asymmetric attention is A = scatter_cols(C, idx): A[:, idx] = C,
    zero elsewhere. All Laplacian applications are expressed through C.
    """

    idx: jax.Array  # [k] global column indices (top-k of query)
    c: jax.Array  # [N, k] row-softmaxed scores over the selected columns
    degree: jax.Array  # [N] row sums of the asymmetric A (pre-symmetrization)
    inv_sqrt: jax.Array  # [N] 1/(sqrt(degree) + 1e-7)


def topk_latent_graph(key_vec, query_vec, alpha: float, k: int,
                      *, dropout_rng=None, dropout_rate: float = 0.0
                      ) -> SparseLatentGraph:
    """Build the sparse latent graph from batch-meaned rank-1 projections.

    key_vec / query_vec: [N] (already meaned over the batch by the caller).
    Top-k support: idx = top_k(query) — identical for every row because the
    score key_i + query_j is additive and LeakyReLU is monotone.
    """
    n = key_vec.shape[0]
    if k > n:
        raise ValueError(f"k={k} > N={n}")
    _, idx = jax.lax.top_k(query_vec, k)  # [k]
    scores = key_vec[:, None] + query_vec[idx][None, :]  # [N, k]
    scores = jax.nn.leaky_relu(scores, negative_slope=alpha)
    c = jax.nn.softmax(scores, axis=-1)  # row softmax over selected columns
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_rng, keep, c.shape)
        c = jnp.where(mask, c / keep, 0.0)
    degree = jnp.sum(c, axis=1)  # pre-symmetrization degree (:141)
    inv_sqrt = 1.0 / (jnp.sqrt(degree) + 1e-7)  # (:145)
    return SparseLatentGraph(idx=idx, c=c, degree=degree, inv_sqrt=inv_sqrt)


def _apply_sym_adjacency(g: SparseLatentGraph, x):
    """y = A_sym @ x with A_sym = ½(A + Aᵀ), A = scatter_cols(C, idx).

    x: [..., N, W]. Two dense MXU matmuls:
      (A x)[i]  = Σ_j C[i, j] x[idx_j]          = C @ x[idx]
      (Aᵀ x)[idx_j] = Σ_i C[i, j] x[i]          = scatter(Cᵀ @ x, idx)
    """
    ax = jnp.einsum("nk,...kw->...nw", g.c, jnp.take(x, g.idx, axis=-2))
    ctx = jnp.einsum("kn,...nw->...kw", g.c.T, x)  # [..., k, W]
    atx = jnp.zeros_like(x).at[..., g.idx, :].set(ctx)
    return 0.5 * (ax + atx)


def laplacian_apply(g: SparseLatentGraph, x):
    """y = L @ x, L = D̂ (D − A_sym) D̂ (base_model.py:144-147).

    With diagonal D̂ = diag(inv_sqrt) and D = diag(degree):
      L x = inv_sqrt ⊙ (degree ⊙ (inv_sqrt ⊙ x) − A_sym (inv_sqrt ⊙ x))
    x: [..., N, W].
    """
    s = g.inv_sqrt[:, None]
    xs = s * x
    return s * (g.degree[:, None] * xs - _apply_sym_adjacency(g, xs))


def sparse_cheb_conv(g: SparseLatentGraph, x):
    """Feature-space Chebyshev conv: [B, N, W] -> [B, 4, N, W].

    Same nonstandard recursion as the dense stack (T0 = 0, T1 = L,
    T2 = 2L², T3 = 4L³ − L; base_model.py:129-133), applied to features:
      t0 = 0, t1 = Lx, t2 = 2L t1 − t0, t3 = 2L t2 − t1.
    Never materializes an [N, N] operator.
    """
    t0 = jnp.zeros_like(x)
    t1 = laplacian_apply(g, x)
    t2 = 2.0 * laplacian_apply(g, t1) - t0
    t3 = 2.0 * laplacian_apply(g, t2) - t1
    return jnp.stack([t0, t1, t2, t3], axis=1)


def dense_attention_equivalent(g: SparseLatentGraph, n: int):
    """Materialize the symmetrized [N, N] attention (tests / small N only)."""
    a = jnp.zeros((n, n), g.c.dtype).at[:, g.idx].set(g.c)
    return 0.5 * (a + a.T)
