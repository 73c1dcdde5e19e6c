"""Pallas kernel equivalence vs jnp twins (interpret mode on CPU; the
same kernels compile natively on TPU — exercised by bench/--use_pallas).

Each kernel must match its jnp twin to float32 tolerance in both the
forward value and the gradients (custom_vjp routes bwd through the twin,
so gradient checks validate the custom_vjp wiring end-to-end)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from stemgnn_tpu.config import StemGNNConfig
from stemgnn_tpu.models import stemgnn
from stemgnn_tpu.ops import jnp_impl
from stemgnn_tpu.ops.pallas_attention import attention_adjacency_pallas
from stemgnn_tpu.ops.pallas_graph import cheb_graph_conv_pallas
from stemgnn_tpu.ops.pallas_spectral import spe_seq_cell_pallas

# pallas_min_nodes=0: the tests pin KERNEL equivalence at a small N, so
# the measured tiny-graph jnp fallback (config.py) must be disabled here.
CFG = StemGNNConfig(units=20, window_size=12, horizon=3, multi_layer=5,
                    pallas_min_nodes=0)


@pytest.fixture(scope="module")
def params():
    return stemgnn.init_params(jax.random.PRNGKey(7), CFG)


@pytest.fixture(autouse=True)
def _interpret_mode():
    """Run Pallas in interpreter mode on CPU (native Mosaic needs a TPU)."""
    with pltpu.force_tpu_interpret_mode():
        yield


def test_spe_seq_cell_matches_twin(params):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 4, CFG.units, CFG.window_size)),
                    dtype=jnp.float32)
    glu = params["blocks"][0]["glu"]
    got = spe_seq_cell_pallas(x, glu, CFG.multi_layer)
    want = jnp_impl.spe_seq_cell(x, glu, CFG.multi_layer)
    assert got.shape == want.shape == (3, 4, CFG.units, CFG.wm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_spe_seq_cell_grad(params):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, CFG.window_size)), dtype=jnp.float32)
    glu = params["blocks"][0]["glu"]

    def loss_pallas(x, glu):
        return jnp.sum(spe_seq_cell_pallas(x, glu, CFG.multi_layer) ** 2)

    def loss_twin(x, glu):
        return jnp.sum(jnp_impl.spe_seq_cell(x, glu, CFG.multi_layer) ** 2)

    gx1, gg1 = jax.grad(loss_pallas, argnums=(0, 1))(x, glu)
    gx2, gg2 = jax.grad(loss_twin, argnums=(0, 1))(x, glu)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-2, rtol=1e-3)
    for a, b in zip(jax.tree.leaves(gg1), jax.tree.leaves(gg2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2, rtol=1e-3)


def test_attention_matches_twin(params):
    rng = np.random.default_rng(2)
    enc = jnp.asarray(rng.standard_normal((5, CFG.units, CFG.units)), dtype=jnp.float32)
    got = attention_adjacency_pallas(
        enc, params["weight_key"], params["weight_query"], CFG.leaky_rate
    )
    want = jnp_impl.attention_adjacency(
        enc, params["weight_key"], params["weight_query"], CFG.leaky_rate
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got).sum(-1), 1.0, atol=1e-5)


def test_attention_grad(params):
    rng = np.random.default_rng(3)
    enc = jnp.asarray(rng.standard_normal((2, CFG.units, CFG.units)), dtype=jnp.float32)

    def loss(fn, e, wk, wq):
        return jnp.sum(fn(e, wk, wq, CFG.leaky_rate) ** 2)

    g1 = jax.grad(lambda e, k, q: loss(attention_adjacency_pallas, e, k, q),
                  argnums=(0, 1, 2))(enc, params["weight_key"], params["weight_query"])
    g2 = jax.grad(lambda e, k, q: loss(jnp_impl.attention_adjacency, e, k, q),
                  argnums=(0, 1, 2))(enc, params["weight_key"], params["weight_query"])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_cheb_graph_conv_matches_twin():
    rng = np.random.default_rng(4)
    n, b, w = CFG.units, 3, CFG.window_size
    lap = jnp.asarray(rng.standard_normal((n, n)) * 0.1, dtype=jnp.float32)
    mul_L = jnp_impl.cheb_polynomial(lap)
    x = jnp.asarray(rng.standard_normal((b, n, w)), dtype=jnp.float32)
    got = cheb_graph_conv_pallas(mul_L, x)
    want = jnp_impl.cheb_graph_conv(mul_L, x)
    assert got.shape == want.shape == (b, 4, n, w)
    np.testing.assert_allclose(np.asarray(got[:, 0]), 0.0)  # k=0 slab is zero
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_cheb_graph_conv_grad():
    rng = np.random.default_rng(5)
    n, b, w = 10, 2, 8
    lap = jnp.asarray(rng.standard_normal((n, n)) * 0.1, dtype=jnp.float32)
    mul_L = jnp_impl.cheb_polynomial(lap)
    x = jnp.asarray(rng.standard_normal((b, n, w)), dtype=jnp.float32)

    def loss(fn, m, xx):
        return jnp.sum(fn(m, xx) ** 2)

    g1 = jax.grad(lambda m, xx: loss(cheb_graph_conv_pallas, m, xx), argnums=(0, 1))(
        mul_L, x
    )
    g2 = jax.grad(lambda m, xx: loss(jnp_impl.cheb_graph_conv, m, xx), argnums=(0, 1))(
        mul_L, x
    )
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


def test_gru_scan_matches_twin(params):
    from stemgnn_tpu.ops.pallas_gru import gru_over_nodes_pallas

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((3, CFG.window_size, CFG.units)),
                    dtype=jnp.float32)
    got = gru_over_nodes_pallas(params["gru"], x)
    want = stemgnn.gru_over_nodes(params["gru"], x)
    assert got.shape == want.shape == (3, CFG.units, CFG.units)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_gru_scan_grad(params):
    """Custom Pallas backward (reverse-grid dh carry + XLA weight einsums)
    vs autodiff through the lax.scan twin — pins every gradient path:
    x, W_ih, b_ih, W_hh, b_hh."""
    from stemgnn_tpu.ops.pallas_gru import gru_over_nodes_pallas

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, CFG.window_size, CFG.units)),
                    dtype=jnp.float32)
    # non-trivial cotangent (weighted sum, not plain sum)
    wgt = jnp.asarray(rng.standard_normal((2, CFG.units, CFG.units)),
                      dtype=jnp.float32)

    def loss(fn, gru, xx):
        return jnp.sum(wgt * fn(gru, xx))

    g1 = jax.grad(lambda gru, xx: loss(gru_over_nodes_pallas, gru, xx),
                  argnums=(0, 1))(params["gru"], x)
    g2 = jax.grad(lambda gru, xx: loss(stemgnn.gru_over_nodes, gru, xx),
                  argnums=(0, 1))(params["gru"], x)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_gru_unroll_vmem_cap_and_fallback(params):
    """Round-5 fix: U=16 at B>=128 put 20.1 MB of double-buffered blocks
    on the 16 MB scoped-VMEM stack and failed real-TPU compilation.
    _pick_unroll must shrink the grid unroll to fit (B=128/H=140 -> 8,
    B=256 -> 4) with grads still matching the scan twin, and
    gru_over_nodes_pallas must fall back to the scan when nothing fits."""
    from stemgnn_tpu.ops import pallas_gru

    assert pallas_gru._pick_unroll(32, 140) == 16  # flagship unchanged
    assert pallas_gru._pick_unroll(128, 140) == 8
    assert pallas_gru._pick_unroll(256, 140) == 4

    rng = np.random.default_rng(21)
    # B grown until the budget picks a REDUCED unroll (covers the
    # unroll != 16 padding/grid path at CFG's small H)
    b = 64
    while pallas_gru._pick_unroll(b, CFG.units) == 16:
        b *= 2
    x = jnp.asarray(rng.standard_normal((b, CFG.window_size, CFG.units)),
                    dtype=jnp.float32)
    wgt = jnp.asarray(
        rng.standard_normal((b, CFG.units, CFG.units)), dtype=jnp.float32)

    def loss(fn, gru, xx):
        return jnp.sum(wgt * fn(gru, xx))

    g1 = jax.grad(lambda gru, xx: loss(
        pallas_gru.gru_over_nodes_pallas, gru, xx),
        argnums=(0, 1))(params["gru"], x)
    g2 = jax.grad(lambda gru, xx: loss(stemgnn.gru_over_nodes, gru, xx),
                  argnums=(0, 1))(params["gru"], x)
    for a, c in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-4, rtol=1e-4)

    # fallback: shrink the budget so nothing fits -> the scan twin runs
    # (bitwise-identical outputs, no pallas_call)
    old = pallas_gru.VMEM_BUDGET_BYTES
    try:
        pallas_gru.VMEM_BUDGET_BYTES = 1
        assert pallas_gru._pick_unroll(2, CFG.units) is None
        xs = x[:2]
        got = pallas_gru.gru_over_nodes_pallas(params["gru"], xs)
        want = stemgnn.gru_over_nodes(params["gru"], xs)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        with pytest.raises(ValueError, match="no grid unroll fits"):
            pallas_gru.gru_scan_pallas(
                jnp.zeros((4, 3, 2, CFG.units)),
                jnp.zeros((3, CFG.units, CFG.units)),
                jnp.zeros((3, 1, CFG.units)),
            )
    finally:
        pallas_gru.VMEM_BUDGET_BYTES = old


def test_full_forward_pallas_matches_jnp(params):
    """End-to-end: forward(use_pallas=True) == forward(use_pallas=False)."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((3, CFG.window_size, CFG.units)),
                    dtype=jnp.float32)
    f_ref, att_ref = stemgnn.forward(params, CFG, x, use_pallas=False)
    f_pal, att_pal = stemgnn.forward(params, CFG, x, use_pallas=True)
    np.testing.assert_allclose(np.asarray(att_pal), np.asarray(att_ref),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref),
                               atol=5e-4, rtol=1e-3)


def test_small_graph_pallas_dispatch_falls_back_to_jnp(params):
    """Below cfg.pallas_min_nodes, forward(use_pallas=True) must take the
    jnp path (measured faster at tiny N — see config.py). Pinned by
    BITWISE equality with use_pallas=False: the Pallas kernels only match
    the twins approximately, so exact equality proves the dispatch."""
    import dataclasses

    cfg = dataclasses.replace(CFG, pallas_min_nodes=64)  # N=20 < 64
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, cfg.window_size, cfg.units)),
                    dtype=jnp.float32)
    f_ref, att_ref = stemgnn.forward(params, cfg, x, use_pallas=False)
    f_pal, att_pal = stemgnn.forward(params, cfg, x, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(f_pal), np.asarray(f_ref))
    np.testing.assert_array_equal(np.asarray(att_pal), np.asarray(att_ref))


def test_bf16_kernels_match_f32_at_tolerance(params):
    """compute_dtype=bfloat16 (bf16 MXU operands, f32 accumulation) must
    track the f32 twins at bf16 tolerance — the full-rate-MXU fast path."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 12, CFG.units)), dtype=jnp.float32)
    f32, _ = stemgnn.forward(params, CFG, x, use_pallas=True, precision="float32")
    bf16, _ = stemgnn.forward(params, CFG, x, use_pallas=True, precision="bfloat16")
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32),
                               atol=5e-2, rtol=5e-2)
    # and the gradient path stays finite
    g = jax.grad(lambda p: jnp.sum(stemgnn.forward(
        p, CFG, x, use_pallas=True, precision="bfloat16")[0] ** 2))(params)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_fused_backward_multi_tile_accumulation():
    """The fused Pallas backwards accumulate parameter grads ACROSS row
    tiles (constant-index output blocks over a sequential grid). The
    small-shape grad tests above fit one tile; this pins the ri>0
    accumulation path: rows > 128 for both kernels."""
    cfg = StemGNNConfig(units=150, window_size=12, horizon=3, multi_layer=5)
    p = stemgnn.init_params(jax.random.PRNGKey(11), cfg)
    rng = np.random.default_rng(12)

    # spe_seq_cell: rows = B*N = 2*150 = 300 -> 3 BWD_ROW_TILE=128 tiles
    x = jnp.asarray(rng.standard_normal((2, 4, cfg.units, cfg.window_size)),
                    dtype=jnp.float32)
    glu = p["blocks"][0]["glu"]
    g1 = jax.grad(lambda xx, gg: jnp.sum(
        spe_seq_cell_pallas(xx, gg, cfg.multi_layer) ** 2), argnums=(0, 1))(x, glu)
    g2 = jax.grad(lambda xx, gg: jnp.sum(
        jnp_impl.spe_seq_cell(xx, gg, cfg.multi_layer) ** 2), argnums=(0, 1))(x, glu)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=1e-3)

    # attention: N = 150 -> 2 ROW_TILE=128 tiles (dquery accumulates)
    enc = jnp.asarray(rng.standard_normal((2, cfg.units, cfg.units)),
                      dtype=jnp.float32)
    a1 = jax.grad(lambda e, k, q: jnp.sum(attention_adjacency_pallas(
        e, k, q, cfg.leaky_rate) ** 2), argnums=(0, 1, 2))(
        enc, p["weight_key"], p["weight_query"])
    a2 = jax.grad(lambda e, k, q: jnp.sum(jnp_impl.attention_adjacency(
        e, k, q, cfg.leaky_rate) ** 2), argnums=(0, 1, 2))(
        enc, p["weight_key"], p["weight_query"])
    for a, b in zip(a1, a2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_spectral_reread_backward_matches_recompute():
    """SAVE_ACTS_BWD=True (fwd saves GLU (a, s); bwd rereads instead of
    recomputing — round-5 A/B, VERDICT r4 item 3). With f32 act storage
    the grads must be BITWISE equal to the recompute kernel's (identical
    values, identical contraction order); with compute-dtype (bf16)
    storage they drift only at bf16 ulp. Multi-tile rows (300 > 2x128)
    pin the accumulation path; row padding (300 % 256 != 0) pins the
    fwd-tile/bwd-tile padding mismatch handling."""
    from stemgnn_tpu.ops import pallas_spectral as ps

    cfg = StemGNNConfig(units=150, window_size=12, horizon=3, multi_layer=5)
    p = stemgnn.init_params(jax.random.PRNGKey(13), cfg)
    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((2, 4, cfg.units, cfg.window_size)),
                    dtype=jnp.float32)
    glu = p["blocks"][0]["glu"]

    def grads(compute_dtype):
        return jax.grad(lambda xx, gg: jnp.sum(
            spe_seq_cell_pallas(xx, gg, cfg.multi_layer, compute_dtype)
            .astype(jnp.float32) ** 2), argnums=(0, 1))(x, glu)

    try:
        ps.SAVE_ACTS_BWD = False
        rec_f32 = grads(jnp.float32)
        rec_bf16 = grads(jnp.bfloat16)
        ps.SAVE_ACTS_BWD = True
        ps.SAVE_ACTS_F32 = True
        rr_f32 = grads(jnp.float32)
        rr_bf16_f32acts = grads(jnp.bfloat16)
        ps.SAVE_ACTS_F32 = False
        rr_bf16_bf16acts = grads(jnp.bfloat16)
    finally:
        ps.SAVE_ACTS_BWD = False
        ps.SAVE_ACTS_F32 = True

    for got, want in ((rr_f32, rec_f32), (rr_bf16_f32acts, rec_bf16)):
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(rr_bf16_bf16acts),
                    jax.tree.leaves(rec_bf16)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0.5, rtol=0.05)


def test_attention_kq_matches_twin_and_grads(params):
    """The kq-level kernel (production dense path; key/query arrive from
    post-scan matmuls on the GRU encoding) == jnp twin, values and
    grads."""
    from stemgnn_tpu.ops.pallas_attention import attention_kq_pallas

    rng = np.random.default_rng(11)
    b, n = 3, 150  # 2 ROW_TILE tiles: exercises the dquery accumulation
    key = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
    query = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = attention_kq_pallas(key, query, 0.2)
    want = jnp_impl.attention_from_kq(key, query, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)

    def loss(fn, k, q):
        return jnp.sum(fn(k, q, 0.2) * jnp.cos(jnp.arange(n, dtype=jnp.float32)))

    with pltpu.force_tpu_interpret_mode():
        gk1, gq1 = jax.grad(lambda k, q: loss(attention_kq_pallas, k, q),
                            argnums=(0, 1))(key, query)
    gk2, gq2 = jax.grad(lambda k, q: loss(jnp_impl.attention_from_kq, k, q),
                        argnums=(0, 1))(key, query)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gq1), np.asarray(gq2),
                               atol=1e-5, rtol=1e-5)


def test_gru_kq_fusion_matches_composed(params):
    """gru_kq_over_nodes (accumulators carried in the scan) == the
    composed gru_over_nodes -> swap -> rank-1 projections, values AND
    gradients. The fusion is a kept-but-rejected experiment (45% slower
    composed, round-3 A/B) — pinned so it stays correct if revisited."""
    rng = np.random.default_rng(13)
    b, w, n = 4, CFG.window_size, CFG.units
    x = jnp.asarray(rng.standard_normal((b, w, n)), jnp.float32)
    wk, wq = params["weight_key"], params["weight_query"]

    def composed(gru, x, wk, wq):
        enc = jnp.swapaxes(stemgnn.gru_over_nodes(gru, x), 1, 2)
        return (enc @ wk)[..., 0], (enc @ wq)[..., 0]

    with jax.default_matmul_precision("float32"):
        k1, q1 = stemgnn.gru_kq_over_nodes(params["gru"], x, wk, wq)
        k2, q2 = composed(params["gru"], x, wk, wq)
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2),
                                   atol=1e-5, rtol=1e-5)

        def loss_fused(gru, x, wk, wq):
            k, q = stemgnn.gru_kq_over_nodes(gru, x, wk, wq)
            return jnp.sum(jnp.sin(k) + jnp.cos(q))

        def loss_composed(gru, x, wk, wq):
            k, q = composed(gru, x, wk, wq)
            return jnp.sum(jnp.sin(k) + jnp.cos(q))

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(params["gru"], x, wk, wq)
        g2 = jax.grad(loss_composed, argnums=(0, 1, 2, 3))(params["gru"], x, wk, wq)
    for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-4)
