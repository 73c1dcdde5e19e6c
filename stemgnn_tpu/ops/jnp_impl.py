"""Pure-`jnp` implementations of the three hot ops.

These are the semantic source of truth; the Pallas kernels in
`stemgnn_tpu.ops.pallas_*` must match them to float tolerance (enforced by
tests/test_pallas_kernels.py). Reference semantics:

- latent attention: base_model.py:151-162 (rank-1 additive scores,
  LeakyReLU(alpha), softmax over the last axis)
- Chebyshev graph conv: base_model.py:62-64 (mul_L[4,N,N] @ x[B,N,W])
- spectral-sequential cell: base_model.py:46-59 (full FFT along W, 3 GLU
  layers applied separately to flattened real/imag parts, inverse FFT of
  the widened spectrum, keep the real part)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense(x, p):
    """x @ w + b with params {'w': [in,out], 'b': [out]}."""
    return x @ p["w"] + p["b"]


def glu(x, p):
    """Gated linear unit: left(x) * sigmoid(right(x)) (base_model.py:12-13)."""
    return dense(x, p["left"]) * jax.nn.sigmoid(dense(x, p["right"]))


def attention_from_kq(key, query, alpha: float):
    """Rank-1 additive attention from precomputed projections.

    key/query: [B, N] — the rank-1 contractions of the GRU encoding
    (base_model.py:153-158), computed in production by post-scan matmuls
    (the in-scan fusion gru_kq_over_nodes is a kept-but-rejected
    experiment — 45% slower composed, round-3 A/B).
    scores[b, i, j] = key[b, i] + query[b, j].
    """
    scores = key[:, :, None] + query[:, None, :]  # [B, N, N]
    scores = jax.nn.leaky_relu(scores, negative_slope=alpha)
    return jax.nn.softmax(scores, axis=-1)


def attention_adjacency(x_enc, weight_key, weight_query, alpha: float):
    """Rank-1 additive self-attention over nodes (base_model.py:151-162).

    Args:
      x_enc: [B, N, N] GRU encoding (already permuted as the reference's
        `input.permute(0, 2, 1)` — callers pass the transposed tensor).
      weight_key / weight_query: [N, 1].
      alpha: LeakyReLU negative slope (0.2 in the reference).

    Returns:
      [B, N, N] row-softmaxed attention (dropout is applied by the caller,
      since it needs an RNG key).
    """
    key = x_enc @ weight_key  # [B, N, 1]
    query = x_enc @ weight_query  # [B, N, 1]
    # scores[b, i, j] = key[b, i] + query[b, j]  (repeat/view pun at :156-158)
    return attention_from_kq(key[..., 0], query[..., 0], alpha)


def cheb_graph_conv(mul_L, x):
    """Chebyshev-Laplacian graph convolution (base_model.py:62-64).

    mul_L: [K, N, N] stacked Chebyshev-basis Laplacians (K=4, T0 = 0).
    x: [B, N, W] node features.
    Returns [B, K, N, W].

    Layout note (round-4 MEASURED REJECTION): a node-major bnkw
    ([B, N, K, W]) internal contract — which makes the spectral cell's
    [B*N, K*W] row view a pure reshape — was implemented and A/B'd
    in-step: 1.270 ms vs 1.208 ms baseline (spread 0.3%). The ~0.1 ms of
    relayout copies the trace shows around the Pallas custom calls did
    not disappear; XLA's layout assignment re-introduced equivalent
    copies (e.g. {1,0,3,2} reshapes) to feed the order contraction, and
    the cheb kernel's output transpose got worse. bknw stays.
    """
    return jnp.einsum("knm,bmw->bknw", mul_L, x)


def order_contract(gconv, weight):
    """Per-order weight contraction summed over orders (base_model.py:66-67).

    gconv: [B, K, N, U]; weight: [K, U, U]. Returns [B, N, U].
    """
    return jnp.einsum("bknu,kuv->bnv", gconv, weight)


def spe_seq_cell(x, glu_params, multi: int):
    """Spectral-sequential cell (base_model.py:46-59).

    x: [B, K, N, W]. Full (not one-sided) FFT along W; real and imaginary
    parts are flattened to [B, N, K*W] and passed through 3 GLU layers
    each (even-indexed GLUs process the real part, odd the imaginary —
    base_model.py:52-54); the widened spectra [B, N, K, W*multi] are
    treated as a length-(W*multi) spectrum and inverse-transformed, keeping
    the real part (torch.irfft(..., onesided=False) semantics).

    glu_params: list of 6 GLU param dicts. Returns [B, K, N, W*multi].
    """
    b, k, n, w = x.shape
    ff = jnp.fft.fft(x, axis=-1)
    real = jnp.transpose(ff.real, (0, 2, 1, 3)).reshape(b, n, k * w)
    imag = jnp.transpose(ff.imag, (0, 2, 1, 3)).reshape(b, n, k * w)
    for i in range(3):
        real = glu(real, glu_params[2 * i])
        imag = glu(imag, glu_params[2 * i + 1])
    wm = w * multi
    real = jnp.transpose(real.reshape(b, n, k, wm), (0, 2, 1, 3))
    imag = jnp.transpose(imag.reshape(b, n, k, wm), (0, 2, 1, 3))
    return jnp.fft.ifft(real + 1j * imag, axis=-1).real


def cheb_polynomial(laplacian):
    """Nonstandard Chebyshev basis with T0 = 0 (base_model.py:121-134).

    T0 = 0 (zeros, NOT the identity — load-bearing quirk: it zeroes the
    k=0 branch of the order contraction), T1 = L, T2 = 2 L^2, T3 = 4 L^3 - L.
    Returns [4, N, N].
    """
    n = laplacian.shape[0]
    t0 = jnp.zeros((n, n), laplacian.dtype)
    t1 = laplacian
    t2 = 2.0 * (laplacian @ t1) - t0
    t3 = 2.0 * (laplacian @ t2) - t1
    return jnp.stack([t0, t1, t2, t3], axis=0)


def laplacian_from_attention(attention):
    """Mean-batch attention -> normalized Laplacian (base_model.py:140-147).

    The degree is computed from the ASYMMETRIC attention before
    symmetrization (:141 precedes :143) — reference quirk, kept.

    attention: [B, N, N]. Returns (mul_L [4,N,N], sym_attention [N,N]).
    """
    att = jnp.mean(attention, axis=0)  # [N, N]
    degree = jnp.sum(att, axis=1)  # pre-symmetrization (:141)
    att = 0.5 * (att + att.T)  # (:143)
    inv_sqrt = 1.0 / (jnp.sqrt(degree) + 1e-7)  # (:145)
    # D^ (D - A) D^  with diagonal D^ applied as row/col scaling
    lap = inv_sqrt[:, None] * (jnp.diag(degree) - att) * inv_sqrt[None, :]
    return cheb_polynomial(lap), att
