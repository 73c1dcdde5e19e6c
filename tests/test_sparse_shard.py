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


def test_production_forward_dispatches_sharded_sparse(mesh, monkeypatch):
    """Round-5 VERDICT item 2: the production model must route sparse
    configs through parallel/sparse_shard.py when a real 'graph' axis is
    present — and produce the single-device sparse path's numbers."""
    from stemgnn_tpu.config import StemGNNConfig
    from stemgnn_tpu.models import stemgnn
    from stemgnn_tpu.parallel import sparse_shard

    cfg = StemGNNConfig(units=24, window_size=8, horizon=3, multi_layer=2,
                        sparse_k=6, gru_hidden=8, gru_segment=0,
                        dropout_rate=0.0)
    params = stemgnn.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((8, 8, 24)), dtype=jnp.float32)

    calls = {"build": 0, "conv": 0}
    orig_build = sparse_shard.build_sharded_graph
    orig_conv = sparse_shard.sharded_sparse_cheb_conv

    def spy_build(*a, **kw):
        calls["build"] += 1
        return orig_build(*a, **kw)

    def spy_conv(*a, **kw):
        calls["conv"] += 1
        return orig_conv(*a, **kw)

    monkeypatch.setattr(sparse_shard, "build_sharded_graph", spy_build)
    monkeypatch.setattr(sparse_shard, "sharded_sparse_cheb_conv", spy_conv)

    ref_fc, _ = stemgnn.forward(params, cfg, x, training=False)
    assert calls == {"build": 0, "conv": 0}  # no mesh -> single-device path
    sh_fc, _ = stemgnn.forward(params, cfg, x, training=False, mesh=mesh)
    assert calls["build"] == 1 and calls["conv"] == cfg.stack_cnt
    np.testing.assert_allclose(
        np.asarray(sh_fc), np.asarray(ref_fc), rtol=1e-5, atol=1e-5
    )
