"""Per-layer and full-forward parity of the JAX model vs numpy goldens,
plus torch ground-truth checks for the pieces the reference delegates to
torch itself (nn.GRU recurrence, FFT conventions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stemgnn_tpu.config import StemGNNConfig
from stemgnn_tpu.models import stemgnn
from stemgnn_tpu.ops import jnp_impl

from tests import goldens

CFG = StemGNNConfig(units=10, window_size=12, horizon=3, multi_layer=5)


@pytest.fixture(scope="module")
def params():
    return stemgnn.init_params(jax.random.PRNGKey(42), CFG)


@pytest.fixture(scope="module")
def x(rng_seed=7):
    rng = np.random.default_rng(rng_seed)
    return rng.standard_normal((4, CFG.window_size, CFG.units)).astype(np.float32)


def test_gru_matches_torch(params, x):
    """The reference's encoder is torch nn.GRU run over the node axis
    (base_model.py:92,137); our lax.scan must match torch exactly."""
    torch = pytest.importorskip("torch")
    gru = params["gru"]
    tgru = torch.nn.GRU(CFG.window_size, CFG.units)
    with torch.no_grad():
        tgru.weight_ih_l0.copy_(torch.from_numpy(np.asarray(gru["w_ih"])))
        tgru.weight_hh_l0.copy_(torch.from_numpy(np.asarray(gru["w_hh"])))
        tgru.bias_ih_l0.copy_(torch.from_numpy(np.asarray(gru["b_ih"])))
        tgru.bias_hh_l0.copy_(torch.from_numpy(np.asarray(gru["b_hh"])))
        tx = torch.from_numpy(x).permute(2, 0, 1).contiguous()
        tout, _ = tgru(tx)
        expected = tout.permute(1, 0, 2).numpy()  # [B, N_seq, N_hid]
    got = np.asarray(stemgnn.gru_over_nodes(gru, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-3)


def test_gru_matches_numpy_golden(params, x):
    got = np.asarray(stemgnn.gru_over_nodes(params["gru"], jnp.asarray(x)))
    expected = goldens.gru_over_nodes(goldens.to_numpy_params(params["gru"]), x.astype(np.float64))
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-3)


def test_fft_convention_matches_torch(x):
    """torch.rfft(x, 1, onesided=False) == full fft; irfft(...,
    onesided=False) == ifft(...).real (base_model.py:49,58)."""
    torch = pytest.importorskip("torch")
    arr = x[..., 0]  # any [B, W] slab
    tf = torch.fft.fft(torch.from_numpy(arr), dim=-1)
    jf = jnp.fft.fft(jnp.asarray(arr), axis=-1)
    np.testing.assert_allclose(np.asarray(jf.real), tf.real.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jf.imag), tf.imag.numpy(), atol=1e-4)
    # inverse: real part of ifft
    ti = torch.fft.ifft(tf, dim=-1).real
    ji = jnp.fft.ifft(jf, axis=-1).real
    np.testing.assert_allclose(np.asarray(ji), ti.numpy(), atol=1e-4)


def test_attention_golden(params, x):
    enc = stemgnn.gru_over_nodes(params["gru"], jnp.asarray(x))
    enc_t = jnp.swapaxes(enc, 1, 2)
    got = np.asarray(
        jnp_impl.attention_adjacency(
            enc_t, params["weight_key"], params["weight_query"], CFG.leaky_rate
        )
    )
    np_params = goldens.to_numpy_params(params)
    expected = goldens.self_graph_attention(
        np.asarray(enc, dtype=np.float64),
        np_params["weight_key"],
        np_params["weight_query"],
        CFG.leaky_rate,
    )
    assert got.shape == (4, CFG.units, CFG.units)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)  # softmax rows
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)


def test_cheb_polynomial_t0_is_zero():
    """T0 = 0 (NOT identity), T1 = L, T2 = 2L^2, T3 = 4L^3 - L
    (base_model.py:129-133)."""
    rng = np.random.default_rng(3)
    lap = rng.standard_normal((6, 6))
    lap = 0.5 * (lap + lap.T)
    out = np.asarray(jnp_impl.cheb_polynomial(jnp.asarray(lap)))
    np.testing.assert_allclose(out[0], np.zeros((6, 6)))
    np.testing.assert_allclose(out[1], lap, atol=1e-6)
    np.testing.assert_allclose(out[2], 2 * lap @ lap, atol=1e-5)
    np.testing.assert_allclose(out[3], 4 * lap @ lap @ lap - lap, atol=1e-5)


def test_laplacian_presym_degree():
    """Degree computed from the asymmetric attention BEFORE symmetrization
    (base_model.py:141-143)."""
    rng = np.random.default_rng(4)
    att_b = jax.nn.softmax(jnp.asarray(rng.standard_normal((3, 6, 6))), axis=-1)
    mul_L, att_sym = jnp_impl.laplacian_from_attention(att_b)
    exp_mul_L, exp_att = goldens.laplacian_and_cheb(np.asarray(att_b.mean(0), dtype=np.float64))
    np.testing.assert_allclose(np.asarray(att_sym), exp_att, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mul_L), exp_mul_L, atol=1e-5)
    # row-softmax attention has degree ~1 per row, so the quirk is subtle:
    # verify against a deliberately asymmetric non-softmax matrix too
    a = np.abs(rng.standard_normal((1, 5, 5))) + 1.0
    mul_L2, _ = jnp_impl.laplacian_from_attention(jnp.asarray(a))
    exp2, _ = goldens.laplacian_and_cheb(a[0])
    np.testing.assert_allclose(np.asarray(mul_L2), exp2, atol=1e-4, rtol=1e-5)


def test_spe_seq_cell_golden(params):
    rng = np.random.default_rng(5)
    g = rng.standard_normal((2, 4, CFG.units, CFG.window_size)).astype(np.float32)
    glu_params = params["blocks"][0]["glu"]
    got = np.asarray(jnp_impl.spe_seq_cell(jnp.asarray(g), glu_params, CFG.multi_layer))
    expected = goldens.spe_seq_cell(
        g.astype(np.float64), goldens.to_numpy_params(glu_params), CFG.multi_layer
    )
    assert got.shape == (2, 4, CFG.units, CFG.wm)
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-4)


def test_block_forward_golden(params):
    rng = np.random.default_rng(6)
    xb = rng.standard_normal((2, CFG.units, CFG.window_size)).astype(np.float32)
    lap = rng.standard_normal((CFG.units, CFG.units)).astype(np.float32) * 0.1
    mul_L = np.asarray(jnp_impl.cheb_polynomial(jnp.asarray(lap)))
    for stack_i in range(2):
        f, b = stemgnn.block_forward(
            params["blocks"][stack_i], CFG, jnp.asarray(xb), jnp.asarray(mul_L), stack_i
        )
        ef, eb = goldens.block_forward(
            goldens.to_numpy_params(params["blocks"][stack_i]),
            xb.astype(np.float64),
            mul_L.astype(np.float64),
            CFG.multi_layer,
            stack_i,
        )
        np.testing.assert_allclose(np.asarray(f), ef, atol=2e-4, rtol=1e-4)
        if stack_i == 0:
            np.testing.assert_allclose(np.asarray(b), eb, atol=2e-4, rtol=1e-4)
        else:
            assert b is None and eb is None


def test_full_forward_golden(params, x):
    got_f, got_att = stemgnn.forward(params, CFG, jnp.asarray(x))
    exp_f, exp_att = goldens.model_forward(goldens.to_numpy_params(params), CFG, x.astype(np.float64))
    assert got_f.shape == (4, CFG.horizon, CFG.units)
    np.testing.assert_allclose(np.asarray(got_att), exp_att, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_f), exp_f, atol=5e-4, rtol=1e-3)


def test_horizon_one_output_shape(params):
    cfg1 = StemGNNConfig(units=10, window_size=12, horizon=1, multi_layer=5)
    p1 = stemgnn.init_params(jax.random.PRNGKey(0), cfg1)
    x1 = jnp.zeros((2, 12, 10))
    f, _ = stemgnn.forward(p1, cfg1, x1)
    assert f.shape == (2, 1, 10)  # base_model.py:176-177


def test_dropout_train_vs_eval(params, x):
    """Dropout (p=0.5 on attention rows, base_model.py:103,161) fires only
    in training mode and changes the output."""
    f_eval, _ = stemgnn.forward(params, CFG, jnp.asarray(x))
    f_eval2, _ = stemgnn.forward(params, CFG, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(f_eval), np.asarray(f_eval2))
    f_train, _ = stemgnn.forward(
        params, CFG, jnp.asarray(x), training=True, dropout_rng=jax.random.PRNGKey(1)
    )
    assert not np.allclose(np.asarray(f_eval), np.asarray(f_train))


def test_param_count_matches_torch_formula():
    """Trainable-param count (printed at handler.py:142-147) for the
    ECG5000 default config must equal the torch model's count."""
    n, w, m, h = 140, 12, 5, 3
    cfg = StemGNNConfig(units=n, window_size=w, horizon=h, multi_layer=m)
    params = stemgnn.init_params(jax.random.PRNGKey(0), cfg)
    wm = w * m
    glu0 = 2 * (4 * w * 4 * w * m + 4 * w * m)  # left+right of layer 0
    gluk = 2 * (4 * w * m * 4 * w * m + 4 * w * m)
    per_block_glu = 2 * glu0 + 4 * gluk  # pairs over 3 layers
    block0 = (
        4 * wm * wm  # contraction weight
        + (wm * wm + wm)  # forecast
        + (wm * w + w)  # forecast_result
        + (wm * w + w)  # backcast (stack 0 only)
        + (w * w + w)  # backcast_short_cut
        + per_block_glu
    )
    block1 = block0 - (wm * w + w)  # no backcast
    gru = 3 * n * w + 3 * n * n + 6 * n
    expected = (
        2 * n  # weight_key + weight_query
        + gru
        + block0
        + block1
        + (w * w + w)  # fc1
        + (w * h + h)  # fc2
    )
    assert stemgnn.param_count(params) == expected


def test_gru_remat_parity(params, x):
    """cfg.gru_remat wiring (round-4 advisor low): jax.checkpoint on the
    scan step must change neither the forward values nor the grads."""
    gru = params["gru"]
    xj = jnp.asarray(x)
    plain = stemgnn.gru_over_nodes(gru, xj, remat=False)
    remat = stemgnn.gru_over_nodes(gru, xj, remat=True)
    np.testing.assert_allclose(np.asarray(remat), np.asarray(plain),
                               rtol=1e-6, atol=1e-6)

    def loss(fn_remat):
        return lambda g, v: jnp.sum(
            stemgnn.gru_over_nodes(g, v, remat=fn_remat) ** 2
        )

    g_plain = jax.grad(loss(False))(gru, xj)
    g_remat = jax.grad(loss(True))(gru, xj)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)


def test_gru_remat_reachable_from_config(x):
    """The knob must be dispatchable from StemGNNConfig (not code-level
    only): forward() with gru_remat=True == default, same seed."""
    cfg_r = StemGNNConfig(units=10, window_size=12, horizon=3, multi_layer=5,
                          gru_remat=True, dropout_rate=0.0)
    cfg_p = StemGNNConfig(units=10, window_size=12, horizon=3, multi_layer=5,
                          dropout_rate=0.0)
    p = stemgnn.init_params(jax.random.PRNGKey(0), cfg_p)
    xj = jnp.asarray(x)
    f_r, _ = stemgnn.forward(p, cfg_r, xj, training=False)
    f_p, _ = stemgnn.forward(p, cfg_p, xj, training=False)
    np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_p),
                               rtol=1e-6, atol=1e-6)
