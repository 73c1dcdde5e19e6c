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


def test_ring_attention_rejects_indivisible():
    mesh = make_mesh(1, 8)
    enc = jnp.zeros((1, 30, 30))
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(mesh, enc, jnp.zeros((30, 1)), jnp.zeros((30, 1)), 0.2)
