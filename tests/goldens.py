"""Numpy golden implementations of every StemGNN layer.

Independent transcriptions of the reference semantics (cited per function)
used as parity fixtures for the JAX model — written against numpy, not
imported from torch or the reference (SURVEY.md section 4). The JAX model
must match these to float32 tolerance given identical parameters.
"""

from __future__ import annotations

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def leaky_relu(x, alpha):
    return np.where(x >= 0, x, alpha * x)


def softmax(x, axis):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def dense(x, p):
    return x @ np.asarray(p["w"]) + np.asarray(p["b"])


def glu(x, p):
    return dense(x, p["left"]) * sigmoid(dense(x, p["right"]))


def gru_over_nodes(gru, x):
    """torch nn.GRU over the node axis (base_model.py:137): x [B,W,N] ->
    output [B, N_seq, N_hid]. Gate order (r, z, n), biases b_ih + b_hh,
    new-gate bias inside the reset product: n = tanh(W_in x + b_in + r*(W_hn h + b_hn))."""
    w_ih, w_hh = np.asarray(gru["w_ih"]), np.asarray(gru["w_hh"])
    b_ih, b_hh = np.asarray(gru["b_ih"]), np.asarray(gru["b_hh"])
    b, w, n = x.shape
    xs = np.transpose(x, (2, 0, 1))  # [N, B, W]
    h = np.zeros((b, n), dtype=x.dtype)
    outs = []
    for t in range(xs.shape[0]):
        gi = xs[t] @ w_ih.T + b_ih  # [B, 3N]
        gh = h @ w_hh.T + b_hh
        r = sigmoid(gi[:, :n] + gh[:, :n])
        z = sigmoid(gi[:, n : 2 * n] + gh[:, n : 2 * n])
        # note: b_hh on the candidate gate multiplies through r
        cand = np.tanh(gi[:, 2 * n :] + r * gh[:, 2 * n :])
        h = (1 - z) * cand + z * h
        outs.append(h)
    return np.stack(outs, axis=1)  # [B, N_seq, N_hid]


def self_graph_attention(x_out, weight_key, weight_query, alpha):
    """base_model.py:151-162 on the GRU output [B, N_seq, N_hid]."""
    inp = np.transpose(x_out, (0, 2, 1))  # permute(0, 2, 1)
    key = inp @ np.asarray(weight_key)  # [B, N, 1]
    query = inp @ np.asarray(weight_query)
    scores = key + np.transpose(query, (0, 2, 1))  # key_i + query_j
    scores = leaky_relu(scores, alpha)
    return softmax(scores, axis=2)


def laplacian_and_cheb(attention_mean):
    """base_model.py:140-148 given the batch-meaned attention [N, N]."""
    degree = attention_mean.sum(axis=1)  # PRE-symmetrization (:141)
    att = 0.5 * (attention_mean + attention_mean.T)
    d_hat = np.diag(1.0 / (np.sqrt(degree) + 1e-7))
    lap = d_hat @ (np.diag(degree) - att) @ d_hat
    n = lap.shape[0]
    t0 = np.zeros((n, n))
    t1 = lap
    t2 = 2 * lap @ t1 - t0
    t3 = 2 * lap @ t2 - t1
    return np.stack([t0, t1, t2, t3]), att


def spe_seq_cell(x, glu_params, multi):
    """base_model.py:46-59: full FFT along W, 3 GLUs on flattened
    real/imag, inverse FFT of the widened spectrum, real part."""
    b, k, n, w = x.shape
    ff = np.fft.fft(x, axis=-1)
    real = np.transpose(ff.real, (0, 2, 1, 3)).reshape(b, n, k * w)
    imag = np.transpose(ff.imag, (0, 2, 1, 3)).reshape(b, n, k * w)
    for i in range(3):
        real = glu(real, glu_params[2 * i])
        imag = glu(imag, glu_params[2 * i + 1])
    wm = w * multi
    real = np.transpose(real.reshape(b, n, k, wm), (0, 2, 1, 3))
    imag = np.transpose(imag.reshape(b, n, k, wm), (0, 2, 1, 3))
    return np.fft.ifft(real + 1j * imag, axis=-1).real


def block_forward(block, x, mul_L, multi, stack_i):
    """base_model.py:61-75 with x [B, N, W]."""
    gfted = np.einsum("knm,bmw->bknw", mul_L, x)
    gconv = spe_seq_cell(gfted, block["glu"], multi)
    igfted = np.einsum("bknu,kuv->bnv", gconv, np.asarray(block["weight"]))
    forecast_source = sigmoid(dense(igfted, block["forecast"]))
    forecast = dense(forecast_source, block["forecast_result"])
    if stack_i == 0:
        short = dense(x, block["backcast_short_cut"])
        backcast = sigmoid(dense(igfted, block["backcast"]) - short)
        return forecast, backcast
    return forecast, None


def model_forward(params, cfg, x):
    """base_model.py:167-179 (eval mode, no dropout). x [B, W, N] ->
    (forecast [B, horizon, N], attention [N, N])."""
    enc = gru_over_nodes(params["gru"], x)
    att_b = self_graph_attention(
        enc, params["weight_key"], params["weight_query"], cfg.leaky_rate
    )
    mul_L, attention = laplacian_and_cheb(att_b.mean(axis=0))
    feat = np.transpose(x, (0, 2, 1))
    forecasts = []
    for i in range(cfg.stack_cnt):
        f, nxt = block_forward(params["blocks"][i], feat, mul_L, cfg.multi_layer, i)
        forecasts.append(f)
        if nxt is not None:
            feat = nxt
    out = forecasts[0] + forecasts[1]
    h = leaky_relu(dense(out, params["fc1"]), 0.01)
    out = dense(h, params["fc2"])
    return np.transpose(out, (0, 2, 1)), attention


def to_numpy_params(params):
    """Convert a jax param pytree to numpy leaves."""
    import jax

    return jax.tree.map(lambda a: np.asarray(a, dtype=np.float64), params)
