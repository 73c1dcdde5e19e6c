"""Sparse top-k latent graph (ops/sparse.py) — the large-N stretch path.

Pins: (1) sparse with k == N is algebraically the dense reference path
(feature-space Chebyshev == materialized T_k stack); (2) the top-k
support is the top-k of `query` for every row (rank-1 + monotone
LeakyReLU); (3) the full model forward with sparse_k == N matches the
dense forward at B == 1; (4) large-N smoke + finite grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stemgnn_tpu.config import StemGNNConfig
from stemgnn_tpu.models import stemgnn
from stemgnn_tpu.ops import jnp_impl
from stemgnn_tpu.ops import sparse as sp


@pytest.fixture
def kq(rng):
    n = 24
    return (
        jnp.asarray(rng.standard_normal(n), dtype=jnp.float32),
        jnp.asarray(rng.standard_normal(n), dtype=jnp.float32),
    )


def _dense_attention(key_vec, query_vec, alpha):
    scores = key_vec[:, None] + query_vec[None, :]
    scores = jax.nn.leaky_relu(scores, negative_slope=alpha)
    return jax.nn.softmax(scores, axis=-1)


def test_full_k_matches_dense_cheb(rng, kq):
    """sparse_cheb_conv with k=N == dense materialized-T_k conv."""
    key_vec, query_vec = kq
    n, w, b = key_vec.shape[0], 8, 3
    x = jnp.asarray(rng.standard_normal((b, n, w)), dtype=jnp.float32)

    att = _dense_attention(key_vec, query_vec, 0.2)
    mul_l, _ = jnp_impl.laplacian_from_attention(att[None])  # B=1 mean is id
    dense_out = jnp_impl.cheb_graph_conv(mul_l, x)

    g = sp.topk_latent_graph(key_vec, query_vec, 0.2, k=n)
    sparse_out = sp.sparse_cheb_conv(g, x)
    np.testing.assert_allclose(np.asarray(sparse_out), np.asarray(dense_out),
                               rtol=2e-4, atol=2e-5)


def test_topk_support_is_query_topk(kq):
    """Rank-1 scores + monotone LeakyReLU: every row's top-k columns are
    the global top-k entries of `query` — columns outside it are zero."""
    key_vec, query_vec = kq
    n, k = key_vec.shape[0], 5
    g = sp.topk_latent_graph(key_vec, query_vec, 0.2, k=k)
    top = set(np.argsort(np.asarray(query_vec))[-k:].tolist())
    assert set(np.asarray(g.idx).tolist()) == top
    # asymmetric A has zero columns off-support; rows sum to 1 (softmax)
    a = jnp.zeros((n, n)).at[:, g.idx].set(g.c)
    off = [j for j in range(n) if j not in top]
    assert float(jnp.abs(a[:, off]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(a.sum(axis=1)), 1.0, rtol=1e-5)


def test_laplacian_apply_matches_dense(rng, kq):
    """L@x through the sparse representation == explicit dense L matmul."""
    key_vec, query_vec = kq
    n, w = key_vec.shape[0], 4
    x = jnp.asarray(rng.standard_normal((n, w)), dtype=jnp.float32)
    k = 7
    g = sp.topk_latent_graph(key_vec, query_vec, 0.2, k=k)
    # explicit dense construction from the same sparse A
    a = np.zeros((n, n), np.float32)
    a[:, np.asarray(g.idx)] = np.asarray(g.c)
    deg = a.sum(axis=1)
    a_sym = 0.5 * (a + a.T)
    d_hat = np.diag(1.0 / (np.sqrt(deg) + 1e-7))
    lap = d_hat @ (np.diag(deg) - a_sym) @ d_hat
    np.testing.assert_allclose(
        np.asarray(sp.laplacian_apply(g, x)), lap @ np.asarray(x),
        rtol=2e-4, atol=2e-5,
    )


def test_forward_sparse_full_k_matches_dense(rng):
    """Model forward with sparse_k=N == dense forward (B=1, eval mode)."""
    n, w, h = 12, 8, 3
    dense_cfg = StemGNNConfig(units=n, window_size=w, horizon=h, multi_layer=2)
    sparse_cfg = StemGNNConfig(units=n, window_size=w, horizon=h, multi_layer=2,
                               sparse_k=n)
    params = stemgnn.init_params(jax.random.PRNGKey(0), dense_cfg)
    x = jnp.asarray(rng.standard_normal((1, w, n)), dtype=jnp.float32)
    f_dense, _ = stemgnn.forward(params, dense_cfg, x)
    f_sparse, g = stemgnn.forward(params, sparse_cfg, x)
    np.testing.assert_allclose(np.asarray(f_sparse), np.asarray(f_dense),
                               rtol=2e-3, atol=2e-4)
    assert isinstance(g, sp.SparseLatentGraph)


def test_large_n_smoke_and_grads():
    """N=2048, k=16: forward + grads run without any [N,N] materialization
    and stay finite."""
    n, w, h, b, k = 2048, 8, 3, 2, 16
    cfg = StemGNNConfig(units=n, window_size=w, horizon=h, multi_layer=2,
                        sparse_k=k)
    params = stemgnn.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, w, n))

    def loss(p):
        f, _ = stemgnn.forward(p, cfg, x)
        return jnp.mean(f ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


# ---------------------------------------------------------------------------
# stretch GRU deviation: hidden-decoupled, segmented (PARITY.md deviations)
# ---------------------------------------------------------------------------


def _mk_gru(rng, w, h):
    return {
        "w_ih": jnp.asarray(rng.standard_normal((3 * h, w)) * 0.3, jnp.float32),
        "w_hh": jnp.asarray(rng.standard_normal((3 * h, h)) * 0.3, jnp.float32),
        "b_ih": jnp.asarray(rng.standard_normal(3 * h) * 0.1, jnp.float32),
        "b_hh": jnp.asarray(rng.standard_normal(3 * h) * 0.1, jnp.float32),
    }


def test_segmented_gru_single_segment_matches_torch_recurrence(rng):
    """seg_len=0 (one segment) must be the exact torch-GRU recurrence with
    hidden H decoupled from N (cross-checked against torch.nn.GRU)."""
    import torch

    b, w, n, h = 3, 6, 10, 5
    gru = _mk_gru(rng, w, h)
    x = jnp.asarray(rng.standard_normal((b, w, n)), jnp.float32)
    got = stemgnn.gru_over_nodes_segmented(gru, x, h, 0)  # [B, N, H]

    tg = torch.nn.GRU(w, h)
    with torch.no_grad():
        tg.weight_ih_l0.copy_(torch.from_numpy(np.asarray(gru["w_ih"])))
        tg.weight_hh_l0.copy_(torch.from_numpy(np.asarray(gru["w_hh"])))
        tg.bias_ih_l0.copy_(torch.from_numpy(np.asarray(gru["b_ih"])))
        tg.bias_hh_l0.copy_(torch.from_numpy(np.asarray(gru["b_hh"])))
        xs = torch.from_numpy(np.asarray(jnp.transpose(x, (2, 0, 1))))
        want, _ = tg(xs)  # [N, B, H]
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(1, 0, 2), atol=2e-6, rtol=1e-5
    )


def test_segmented_gru_equals_per_segment_runs(rng):
    """Segmentation semantics: each segment is an independent h0=0
    recurrence — identical to running the GRU on each node slice."""
    b, w, n, h, seg = 2, 6, 12, 4, 5  # N=12, seg=5 -> segments 5,5,2 (pad)
    gru = _mk_gru(rng, w, h)
    x = jnp.asarray(rng.standard_normal((b, w, n)), jnp.float32)
    got = stemgnn.gru_over_nodes_segmented(gru, x, h, seg)
    parts = []
    for lo in range(0, n, seg):
        parts.append(
            stemgnn.gru_over_nodes_segmented(gru, x[:, :, lo : lo + seg], h, 0)
        )
    want = jnp.concatenate(parts, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_stretch_forward_and_grads_finite(rng):
    """Full stretch config: sparse_k + gru_hidden + gru_segment. N=2048
    forward + grads finite on CPU, and the GRU params are O(H^2) not
    O(N^2)."""
    cfg = StemGNNConfig(units=2048, window_size=8, horizon=3, multi_layer=2,
                        sparse_k=16, gru_hidden=32, gru_segment=256)
    params = stemgnn.init_params(jax.random.PRNGKey(0), cfg)
    assert params["gru"]["w_hh"].shape == (96, 32)
    assert params["weight_key"].shape == (32, 1)
    x = jnp.asarray(rng.standard_normal((2, 8, 2048)), jnp.float32)

    def loss(p):
        f, _ = stemgnn.forward(p, cfg, x, training=False)
        return jnp.sum(f ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_gru_hidden_requires_sparse_k():
    with pytest.raises(ValueError, match="requires sparse_k"):
        StemGNNConfig(units=16, window_size=8, gru_hidden=8)
    with pytest.raises(ValueError, match="requires gru_hidden"):
        StemGNNConfig(units=16, window_size=8, sparse_k=4, gru_segment=4)
