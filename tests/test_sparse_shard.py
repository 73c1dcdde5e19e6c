"""Node-sharded sparse graph (parallel/sparse_shard.py) == single-device
sparse path (ops/sparse.py) on the 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stemgnn_tpu.ops import sparse as sp
from stemgnn_tpu.parallel.mesh import make_mesh
from stemgnn_tpu.parallel import sparse_shard as ss


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data_axis=2, graph_axis=4)


def _vectors(n, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal(n), dtype=jnp.float32),
        jnp.asarray(rng.standard_normal(n), dtype=jnp.float32),
    )


def test_sharded_graph_matches_single_device(mesh):
    n, k, alpha = 16, 5, 0.2
    key_vec, query_vec = _vectors(n)
    g_ref = sp.topk_latent_graph(key_vec, query_vec, alpha, k)
    g_sh = ss.build_sharded_graph(mesh, key_vec, query_vec, alpha, k)
    np.testing.assert_array_equal(np.asarray(g_sh.idx), np.asarray(g_ref.idx))
    np.testing.assert_allclose(np.asarray(g_sh.c), np.asarray(g_ref.c), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_sh.degree), np.asarray(g_ref.degree), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_sh.inv_sqrt), np.asarray(g_ref.inv_sqrt), rtol=1e-6
    )


def test_sharded_cheb_conv_matches_single_device(mesh):
    n, k, w, b, alpha = 16, 6, 8, 4, 0.2
    key_vec, query_vec = _vectors(n, seed=1)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((b, n, w)), dtype=jnp.float32)
    g_ref = sp.topk_latent_graph(key_vec, query_vec, alpha, k)
    ref = sp.sparse_cheb_conv(g_ref, x)
    g_sh = ss.build_sharded_graph(mesh, key_vec, query_vec, alpha, k)
    out = ss.sharded_sparse_cheb_conv(mesh, g_sh, x)
    assert out.shape == (b, 4, n, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_sharded_cheb_conv_k_equals_n_matches_dense(mesh):
    """k=N composes back to the exact dense reference semantics (the same
    invariant ops/sparse.py pins single-device)."""
    from stemgnn_tpu.ops import jnp_impl

    n, w, b, alpha = 16, 8, 2, 0.2
    key_vec, query_vec = _vectors(n, seed=3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((b, n, w)), dtype=jnp.float32)
    g_sh = ss.build_sharded_graph(mesh, key_vec, query_vec, alpha, n)
    out = ss.sharded_sparse_cheb_conv(mesh, g_sh, x)
    # dense twin: materialize attention -> laplacian -> cheb stack @ x
    scores = jax.nn.leaky_relu(
        key_vec[:, None] + query_vec[None, :], negative_slope=alpha
    )
    att = jax.nn.softmax(scores, axis=-1)[None]  # [1, N, N]
    mul_l, _ = jnp_impl.laplacian_from_attention(att)
    dense = jnp.einsum("knm,bmw->bknw", mul_l, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), rtol=1e-4, atol=1e-5)


def test_sharded_graph_under_jit_grad(mesh):
    """The sharded conv must be differentiable (it sits on the train path)."""
    n, k, w, b = 16, 4, 8, 2
    key_vec, query_vec = _vectors(n, seed=5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((b, n, w)), dtype=jnp.float32)

    @jax.jit
    def loss_fn(kv, qv, x):
        g = ss.build_sharded_graph(mesh, kv, qv, 0.2, k)
        return jnp.sum(ss.sharded_sparse_cheb_conv(mesh, g, x) ** 2)

    grads = jax.grad(loss_fn, argnums=(0, 1, 2))(key_vec, query_vec, x)
    for g_arr in grads:
        assert np.all(np.isfinite(np.asarray(g_arr)))

    def ref_loss(kv, qv, x):
        g = sp.topk_latent_graph(kv, qv, 0.2, k)
        return jnp.sum(sp.sparse_cheb_conv(g, x) ** 2)

    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(key_vec, query_vec, x)
    for g_sh_arr, g_ref_arr in zip(grads, ref_grads):
        # atol covers accumulation-order noise on ~0 entries (values are ~1e2)
        np.testing.assert_allclose(
            np.asarray(g_sh_arr), np.asarray(g_ref_arr), rtol=1e-4, atol=5e-4
        )
