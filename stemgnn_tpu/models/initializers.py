"""Torch-distribution-compatible initializers.

The 1%-MAE parity bar (BASELINE.md) requires matching the reference's
*init distributions* (not its exact RNG draws): xavier_uniform with gain
1.414 for the attention vectors (base_model.py:88-91), xavier_normal for
the block contraction weight (base_model.py:26), torch's default
kaiming-uniform(a=sqrt(5)) for every nn.Linear, and uniform(-1/sqrt(H),
1/sqrt(H)) for all GRU weights/biases (torch nn.GRU default).

torch fan computation for an ND tensor (torch.nn.init._calculate_fan_in_and_fan_out):
    receptive = prod(shape[2:]);  fan_in = shape[1]*receptive;  fan_out = shape[0]*receptive
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _torch_fans(shape) -> tuple[int, int]:
    receptive = 1
    for d in shape[2:]:
        receptive *= d
    return shape[1] * receptive, shape[0] * receptive


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ on a torch-layout tensor of `shape`."""
    fan_in, fan_out = _torch_fans(shape)
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def xavier_normal(key, shape, gain: float = 1.0, dtype=jnp.float32):
    """torch.nn.init.xavier_normal_ on a torch-layout tensor of `shape`."""
    fan_in, fan_out = _torch_fans(shape)
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def linear_params(key, in_features: int, out_features: int, dtype=jnp.float32):
    """torch nn.Linear default init.

    torch stores weight as [out, in] and draws kaiming_uniform(a=sqrt(5)),
    which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias likewise.
    We store the weight transposed ([in, out]) for `x @ w + b`.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    w = jax.random.uniform(kw, (in_features, out_features), dtype, -bound, bound)
    b = jax.random.uniform(kb, (out_features,), dtype, -bound, bound)
    return {"w": w, "b": b}


def uniform_scaled(key, shape, hidden_size: int, dtype=jnp.float32):
    """torch RNN default init: U(-1/sqrt(H), 1/sqrt(H)) (nn.GRU.reset_parameters)."""
    bound = 1.0 / math.sqrt(hidden_size)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


# ---------------------------------------------------------------------------
# torch-faithful init STREAM (production default; round-5 mitigation)
# ---------------------------------------------------------------------------


def torch_stream_init(seed: int, cfg) -> dict:
    """Draw the full param pytree from torch's MT19937 CPU stream, in the
    exact order ``Model.__init__`` consumes it (base_model.py:79-104):

      weight_key, weight_query (xavier_uniform gain=1.414, :88-91) ->
      nn.GRU(W, H) reset_parameters (w_ih, w_hh, b_ih, b_hh, all
      U(-1/sqrt(H),1/sqrt(H)), :92) -> per block (:93-95 ->
      StockBlockLayer.__init__ :16-44): contraction weight
      ([1,4,1,Wm,Wm] xavier_normal, :23-26), forecast, forecast_result,
      [backcast stack-0 only], backcast_short_cut, 6 GLU (left, right)
      linears -> head fc1, fc2 (:97-101).

    With the default seed 0 this reproduces — bit-exactly for every
    uniform-initialized tensor, to <=2 ulp for the one normal-initialized
    tensor — the draw the reference's hardcoded ``torch.manual_seed(0)``
    (main.py:52) produces.  Why this is the production default: the
    round-4 variance bisect showed threefry-stream draws hit a ~2.5%-
    worse ECG loss basin ~7/14 times vs ~1/14 for this stream
    (benchmarks/variance_bisect.json; PARITY.md).  Returns numpy float32
    arrays in our pytree layout (linear weights transposed to [in,out],
    block weight reshaped [4,Wm,Wm]).

    Generalizes to the stretch shapes (gru_hidden/decoupled H): the draw
    order is the same, only the shapes change — there is no reference
    counterpart at those shapes, so "torch-faithful" there means "the
    same stream and order", which is what the mitigation needs.
    """
    from stemgnn_tpu.utils.torch_rng import MT19937Engine

    n, w, wm = cfg.units, cfg.window_size, cfg.wm
    h = cfg.gru_hidden if cfg.gru_hidden is not None else n
    eng = MT19937Engine(seed)

    def lin(out_f, in_f):
        wt, b = eng.linear_(out_f, in_f)
        return {"w": wt.T.copy(), "b": b}

    params = {
        # [H,1]: torch fans for 2-D are (fan_in=size(1)=1, fan_out=size(0)=H)
        "weight_key": eng.xavier_uniform_((h, 1), 1.414, 1, h),
        "weight_query": eng.xavier_uniform_((h, 1), 1.414, 1, h),
        "gru": {
            "w_ih": eng.uniform_((3 * h, w), -1.0 / math.sqrt(h), 1.0 / math.sqrt(h)),
            "w_hh": eng.uniform_((3 * h, h), -1.0 / math.sqrt(h), 1.0 / math.sqrt(h)),
            "b_ih": eng.uniform_((3 * h,), -1.0 / math.sqrt(h), 1.0 / math.sqrt(h)),
            "b_hh": eng.uniform_((3 * h,), -1.0 / math.sqrt(h), 1.0 / math.sqrt(h)),
        },
        "blocks": [],
    }
    for stack_i in range(cfg.stack_cnt):
        # 5-D [1,4,1,wm,wm]: receptive = 1*wm*wm, fan_in = 4*rec, fan_out = 1*rec
        blk = {
            "weight": eng.xavier_normal_(
                (1, 4, 1, wm, wm), 1.0, 4 * wm * wm, wm * wm
            ).reshape(4, wm, wm),
            "forecast": lin(wm, wm),
            "forecast_result": lin(w, wm),
        }
        if stack_i == 0:
            blk["backcast"] = lin(w, wm)
        blk["backcast_short_cut"] = lin(w, w)
        dims = [(cfg.glu_in, cfg.glu_out)] * 2 + [(cfg.glu_out, cfg.glu_out)] * 4
        blk["glu"] = [
            {"left": lin(d_out, d_in), "right": lin(d_out, d_in)}
            for d_in, d_out in dims
        ]
        # dict key order is draw order EXCEPT backcast: torch draws it
        # BETWEEN forecast_result and backcast_short_cut (:29-31) — the
        # insertion above preserves that; pytree key order is irrelevant
        # downstream (dicts are looked up by name).
        params["blocks"].append(blk)
    params["fc1"] = lin(w, w)
    params["fc2"] = lin(cfg.horizon, w)
    return params
