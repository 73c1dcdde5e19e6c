"""Ring-partitioned attention == dense jnp twin (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stemgnn_tpu.ops import jnp_impl
from stemgnn_tpu.parallel.mesh import make_mesh
from stemgnn_tpu.parallel.ring import ring_attention

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual CPU devices"
)


@pytest.mark.parametrize("graph_axis", [2, 4, 8])
def test_ring_attention_matches_dense(graph_axis):
    rng = np.random.default_rng(0)
    b, n = 3, 32  # n divisible by every graph_axis
    enc = jnp.asarray(rng.standard_normal((b, n, n)), dtype=jnp.float32)
    wk = jnp.asarray(rng.standard_normal((n, 1)) * 0.3, dtype=jnp.float32)
    wq = jnp.asarray(rng.standard_normal((n, 1)) * 0.3, dtype=jnp.float32)
    mesh = make_mesh(1, graph_axis)
    got = ring_attention(mesh, enc, wk, wq, 0.2)
    want = jnp_impl.attention_adjacency(enc, wk, wq, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got).sum(-1), 1.0, atol=1e-5)


def test_forward_use_ring_matches_dense():
    """Full model forward with the ring attention path (use_ring=True on a
    1x4 mesh) == single-device dense forward."""
    from stemgnn_tpu.config import StemGNNConfig
    from stemgnn_tpu.models import stemgnn

    rng = np.random.default_rng(1)
    n, w, h, b = 16, 8, 3, 4
    cfg = StemGNNConfig(units=n, window_size=w, horizon=h, multi_layer=2)
    params = stemgnn.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((b, w, n)), dtype=jnp.float32)
    f_dense, att_dense = stemgnn.forward(params, cfg, x)
    mesh = make_mesh(1, 4)
    f_ring, att_ring = stemgnn.forward(params, cfg, x, mesh=mesh, use_ring=True)
    np.testing.assert_allclose(np.asarray(att_ring), np.asarray(att_dense),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f_ring), np.asarray(f_dense),
                               atol=5e-4, rtol=1e-3)


def test_ring_sharded_train_step_runs():
    """One sharded train step with use_ring=True on a 2x4 mesh: finite
    loss, params update."""
    from stemgnn_tpu.config import StemGNNConfig
    from stemgnn_tpu.models import stemgnn
    from stemgnn_tpu.parallel.train import make_sharded_train_step
    from stemgnn_tpu.train.optim import make_optimizer

    n, w, h, b = 16, 8, 3, 4
    cfg = StemGNNConfig(units=n, window_size=w, horizon=h, multi_layer=2)
    params = stemgnn.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer("RMSProp", 1e-3)
    opt_state = opt.init(params)
    mesh = make_mesh(2, 4)
    rng = np.random.default_rng(2)
    data = jnp.asarray(rng.standard_normal((64, n)), dtype=jnp.float32)
    hi = jnp.asarray(rng.integers(w, 64 - h, size=b), dtype=jnp.int32)
    step = make_sharded_train_step(cfg, opt, mesh, use_ring=True)
    p0 = jax.tree.map(lambda a: np.asarray(a).copy(), params)
    params, opt_state, loss = step(params, opt_state, data, hi,
                                   jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    changed = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p0))
    )
    assert changed


def test_eval_programs_use_ring_match_dense():
    """The production eval programs (make_eval_step / make_eval_epoch_fn)
    with use_ring=True on a 1x4 mesh == the single-device dense eval —
    a --use_ring training run validates through the SAME attention path
    it trains with (VERDICT r2 item 7)."""
    from stemgnn_tpu.config import StemGNNConfig
    from stemgnn_tpu.models import stemgnn
    from stemgnn_tpu.train.engine import make_eval_epoch_fn, make_eval_step

    rng = np.random.default_rng(3)
    n, w, h, b = 16, 8, 3, 4
    cfg = StemGNNConfig(units=n, window_size=w, horizon=h, multi_layer=2)
    params = stemgnn.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((b, w, n)), dtype=jnp.float32)
    mesh = make_mesh(1, 4)

    dense_step = make_eval_step(cfg, False)
    ring_step = make_eval_step(cfg, False, mesh=mesh, use_ring=True)
    np.testing.assert_allclose(
        np.asarray(ring_step(params, x)), np.asarray(dense_step(params, x)),
        atol=5e-4, rtol=1e-3,
    )

    data = jnp.asarray(rng.standard_normal((64, n)), dtype=jnp.float32)
    hi_matrix = jnp.asarray(rng.integers(w, 64 - h, size=(2, b)), dtype=jnp.int32)
    dense_epoch = make_eval_epoch_fn(cfg, False)
    ring_epoch = make_eval_epoch_fn(cfg, False, mesh=mesh, shard_batch=True,
                                    use_ring=True)
    fd, yd = dense_epoch(params, data, hi_matrix)
    fr, yr = ring_epoch(params, data, hi_matrix)
    np.testing.assert_allclose(np.asarray(fr), np.asarray(fd),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yd), atol=0)


def test_ring_attention_rejects_indivisible():
    mesh = make_mesh(1, 8)
    enc = jnp.zeros((1, 30, 30))
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(mesh, enc, jnp.zeros((30, 1)), jnp.zeros((30, 1)), 0.2)
