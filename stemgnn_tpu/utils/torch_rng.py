"""Bit-faithful numpy replication of torch's CPU RNG init draws.

Round-4 forensics (benchmarks/variance_bisect.json, PARITY.md) isolated
the ECG seed-to-seed outcome spread to the parameter INIT DRAW: draws
from jax's threefry stream land in a ~2.5%-worse loss basin ~7/14 times,
draws from torch's MT19937 stream ~1/14.  The mitigation (round-5
VERDICT item 1) is to draw production inits from the *torch-faithful*
stream.  This module reproduces torch's CPU generator without importing
torch:

- ``MT19937Engine`` — the at::mt19937 engine (ATen MT19937RNGEngine.h):
  standard Knuth ``init_genrand`` seeding (``state[0]=seed&0xffffffff;
  state[j]=1812433253*(state[j-1]^(state[j-1]>>30))+j``) + the standard
  twist/tempering, which torch.manual_seed(seed) installs.  Driven here
  through ``numpy.random.MT19937`` by injecting that key with pos=624
  (numpy's twist+tempering are the same standard algorithm).
- ``uniform_`` — at::uniform_real_distribution<float>: one 32-bit draw
  per element, ``(u32 & (2^24-1)) * 2^-24``, then ``x*(to-from)+from``
  in float32.  **Bit-exact** vs torch (pinned by
  tests/test_torch_rng.py against the in-image torch).
- ``normal_`` — the CPU float ``normal_fill`` path (ATen
  cpu/DistributionKernels.cpp): fill numel uniforms (plus a fresh block
  of 16 when numel%16!=0, overwriting the tail), then per 16-block
  Box-Muller: ``r=sqrt(-2*log(1-u[j])); th=2*pi*u[j+8];
  out[j]=r*cos(th)*std+mean; out[j+8]=r*sin(th)*std+mean``.  The draw
  *sequence* (u32 consumption) is exact; values agree to <=2 ulp (torch
  evaluates log/cos/sin with Sleef u10, numpy with its own SIMD libm) —
  measured max |diff| 4.8e-7 over 10k draws, and the post-normal stream
  stays bit-synchronized.  Only the block contraction weight
  (xavier_normal_, base_model.py:26) takes this path.

The init-order replication of the reference ``Model.__init__``
(base_model.py:79-104) lives in ``torch_stream_init`` — see the call
order comments inline.  torch bound computations (xavier/kaiming) are
replicated at double precision exactly as torch.nn.init computes them
(e.g. xavier's ``a = sqrt(3.0) * (gain * sqrt(2.0/(fan_in+fan_out)))``,
NOT the algebraically-equal ``gain*sqrt(6/s)`` — the roundings differ).
"""

from __future__ import annotations

import math

import numpy as np

_FLOAT_MASK = np.uint32((1 << 24) - 1)
_FLOAT_DIV = np.float32(1.0 / (1 << 24))


def _init_genrand_key(seed: int) -> np.ndarray:
    """at::mt19937::seed(seed) state (standard init_genrand)."""
    s = seed & 0xFFFFFFFF
    key = np.empty(624, dtype=np.uint32)
    key[0] = s
    prev = s
    for j in range(1, 624):
        prev = (1812433253 * (prev ^ (prev >> 30)) + j) & 0xFFFFFFFF
        key[j] = prev
    return key


class MT19937Engine:
    """The stream torch.manual_seed(seed) installs on the CPU generator."""

    def __init__(self, seed: int):
        bg = np.random.MT19937()
        state = bg.state
        state["state"]["key"] = _init_genrand_key(seed)
        state["state"]["pos"] = 624  # force a twist before the first output
        bg.state = state
        self._bg = bg

    def random_u32(self, n: int) -> np.ndarray:
        return self._bg.random_raw(n).astype(np.uint32)

    # --- tensor fills (element order == torch's contiguous fill order) ---

    def uniform_(self, shape, low: float, high: float) -> np.ndarray:
        """torch tensor.uniform_(low, high) on a float32 tensor.

        The final affine map is evaluated as fmaf(x, to-from, from):
        torch's AVX2-compiled fill contracts ``x*(to_-from_)+from_`` into
        vfmadd (measured: 50.5% of draws differ by 1 ulp without it, 0
        of 100k with it).  Emulated exactly in f64 — the f32*f32 product
        is exact in f64, so f64-add + one rounding == a true fma here.
        """
        n = int(np.prod(shape)) if shape else 1
        x = (self.random_u32(n) & _FLOAT_MASK).astype(np.float32) * _FLOAT_DIV
        lo, hi = np.float32(low), np.float32(high)
        d = np.float64(hi - lo)  # (to_ - from_) is computed in f32 first
        out = (x.astype(np.float64) * d + np.float64(lo)).astype(np.float32)
        return out.reshape(shape)

    def normal_(self, shape, mean: float, std: float) -> np.ndarray:
        """torch tensor.normal_(mean, std) on a float32 tensor, numel>=16
        (the vectorized normal_fill path; smaller tensors take torch's
        serial generator-cached path, which no StemGNN init needs)."""
        n = int(np.prod(shape))
        if n < 16:
            raise NotImplementedError(
                "normal_fill path requires numel >= 16 (torch's serial "
                "Box-Muller cache path is not replicated; no reference "
                "init tensor is this small)"
            )
        data = self.uniform_(n, 0.0, 1.0)
        out = self._normal_transform(data, mean, std)
        if n % 16 != 0:
            tail = self.uniform_(16, 0.0, 1.0)
            out[n - 16 :] = self._normal_transform(tail, mean, std)
        return out.reshape(shape)

    @staticmethod
    def _normal_transform(data: np.ndarray, mean: float, std: float):
        """normal_fill_16 over each full 16-block (float32 throughout)."""
        n = data.shape[0]
        out = data.copy()
        m = (n // 16) * 16
        blk = data[:m].reshape(-1, 16)
        u1 = np.float32(1.0) - blk[:, :8]
        u2 = blk[:, 8:]
        radius = np.sqrt(np.float32(-2.0) * np.log(u1), dtype=np.float32)
        theta = np.float32(2.0 * math.pi) * u2
        res = out[:m].reshape(-1, 16)
        res[:, :8] = radius * np.cos(theta) * np.float32(std) + np.float32(mean)
        res[:, 8:] = radius * np.sin(theta) * np.float32(std) + np.float32(mean)
        return out

    # --- torch.nn.init replications (exact double-precision bounds) ---

    def xavier_uniform_(self, shape, gain: float, fan_in: int, fan_out: int):
        """nn.init.xavier_uniform_: a = sqrt(3)*std, std = gain*sqrt(2/s)."""
        std = gain * math.sqrt(2.0 / float(fan_in + fan_out))
        a = math.sqrt(3.0) * std
        return self.uniform_(shape, -a, a)

    def xavier_normal_(self, shape, gain: float, fan_in: int, fan_out: int):
        std = gain * math.sqrt(2.0 / float(fan_in + fan_out))
        return self.normal_(shape, 0.0, std)

    def linear_(self, out_features: int, in_features: int):
        """nn.Linear.reset_parameters: kaiming_uniform_(a=sqrt(5)) on the
        [out,in] weight (== U(-b,b), b = sqrt(3)*(sqrt(2/(1+5))/sqrt(fan)))
        then U(-1/sqrt(fan), 1/sqrt(fan)) on the bias.  Returns (w, b)
        with w in torch layout [out, in]."""
        gain = math.sqrt(2.0 / (1.0 + 5.0))  # calculate_gain('leaky_relu', sqrt(5))
        std = gain / math.sqrt(in_features)
        bound = math.sqrt(3.0) * std
        w = self.uniform_((out_features, in_features), -bound, bound)
        bb = 1.0 / math.sqrt(in_features)
        b = self.uniform_((out_features,), -bb, bb)
        return w, b
