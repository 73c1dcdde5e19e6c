"""Analytic FLOP model + peak-rate table for MFU / speed-of-light accounting.

VERDICT r2 item 3 / BASELINE.md:23 ("per-chip speed-of-light"): every
benchmark row carries achieved TFLOP/s and %-of-peak, computed from this
per-component forward-FLOP model.

Conventions:
- FLOPs are multiply-add-counted as 2 ops (matmul [p,q]@[q,r] = 2*p*q*r).
- The FFT/iFFT inside the spectral cell is counted as the DFT *matmuls*
  the Pallas kernel actually executes (ops/pallas_spectral.py:40-72 builds
  cos/sin factor matrices); the jnp twin's O(W log W) FFT does strictly
  fewer FLOPs, so the model is an upper bound there.
- A train step is counted as 3x forward (backward ~= 2x forward for
  matmul-dominated programs; the GRU recurrence follows the same ratio).
  This is the standard MFU convention (e.g. PaLM appendix B).
- Small elementwise work (softmax, gates, residuals) is excluded — on the
  flagship config it is <1% of the matmul FLOPs and is memory-bound
  anyway; the roofline harness (benchmarks/roofline.py) accounts bytes
  separately.
"""

from __future__ import annotations

from typing import Dict, Optional

from stemgnn_tpu.config import StemGNNConfig


def forward_flops(cfg: StemGNNConfig, batch: int) -> Dict[str, float]:
    """Per-component forward-pass FLOPs for one batch.

    Components mirror the hot loops in SURVEY.md 3.3; the dense and the
    sparse/stretch paths are modeled separately where they diverge.
    """
    n, w, m, b = cfg.units, cfg.window_size, cfg.multi_layer, batch
    wm = cfg.wm
    gin, gout = cfg.glu_in, cfg.glu_out  # 4W, 4Wm
    horizon = cfg.horizon
    stacks = cfg.stack_cnt
    f: Dict[str, float] = {}

    # --- latent correlation layer -------------------------------------
    if cfg.gru_hidden is not None:
        # stretch deviation: hidden-decoupled segmented GRU (O(N*H^2))
        h = cfg.gru_hidden
        f["gru"] = 2.0 * n * b * w * 3 * h + 6.0 * b * n * h * h
    else:
        # node-axis GRU, hidden == N: hoisted input projection + N
        # sequential [B,N]@[N,3N] recurrence matmuls (models/stemgnn.py)
        f["gru"] = 2.0 * n * b * w * 3 * n + 6.0 * b * n * n * n

    if cfg.sparse_k is not None:
        k = cfg.sparse_k
        # rank-1 projections on the batch-meaned encoding + O(N^2) score
        # grid + top-k selection (ops/sparse.py); scores are rank-1 adds,
        # not matmuls — count the projections only
        hdim = cfg.gru_hidden if cfg.gru_hidden is not None else n
        f["attention"] = 4.0 * b * n * hdim
        # sparse Chebyshev conv: 4 orders, k neighbors, W features, per stack
        f["graph_conv"] = stacks * 2.0 * 4 * b * n * k * w
    else:
        # rank-1 key/query projections [B,N,N]@[N,1] x2
        f["attention"] = 4.0 * b * n * n
        # Chebyshev basis: T2 = 2L^2, T3 = 2L*T2 - T1 -> two N^3 matmuls
        # (batch-independent, ops/jnp_impl.py:95-107)
        f["cheb"] = 2 * 2.0 * n * n * n
        # dense graph conv: mul_L [4,N,N] @ x [B,N,W], per stack
        f["graph_conv"] = stacks * 2.0 * 4 * b * n * n * w

    # --- spectral cell (per stack): DFT matmuls + 3 GLU layers x2 branch
    dft = 2 * 2.0 * b * 4 * n * w * w        # cos+sin factor matmuls (fwd)
    idft = 2 * 2.0 * b * 4 * n * wm * wm     # inverse on the widened axis
    glu = 8.0 * b * n * gin * gout + 16.0 * b * n * gout * gout
    f["spectral_cell"] = stacks * (dft + idft + glu)

    # --- per-order weight contraction [B,4,N,Wm] x [4,Wm,Wm], per stack
    f["contraction"] = stacks * 2.0 * 4 * b * n * wm * wm

    # --- block heads: forecast Wm->Wm->W (+ stack-0 backcast Wm->W, W->W)
    heads = stacks * (2.0 * b * n * wm * wm + 2.0 * b * n * wm * w)
    heads += 2.0 * b * n * wm * w + 2.0 * b * n * w * w  # stack-0 backcast
    f["heads"] = heads

    # --- output head fc: W->W -> LeakyReLU -> W->horizon
    f["fc"] = 2.0 * b * n * w * w + 2.0 * b * n * w * horizon
    return f


def train_step_flops(cfg: StemGNNConfig, batch: int) -> float:
    """Total FLOPs for one train step (fwd + bwd ~= 3x forward)."""
    return 3.0 * sum(forward_flops(cfg, batch).values())


# Published per-chip peak dense-matmul rates (TFLOP/s, bf16 operands /
# f32 accumulate — the MXU's native mode and the standard MFU denominator).
_PEAK_BF16_TFLOPS = {
    "v2": 45.0,
    "v3": 123.0,
    "v4": 275.0,
    "v5 lite": 394.0,   # v5e device_kind reports "TPU v5 lite"
    "v5e": 394.0,
    "v5p": 459.0,
    "v6 lite": 918.0,   # Trillium
    "v6e": 918.0,
}


def peak_tflops_bf16(device_kind: str) -> Optional[float]:
    """Peak bf16 TFLOP/s for a jax device_kind string, None if unknown."""
    kind = device_kind.lower()
    # match the most specific key (e.g. "v5 lite" before "v5")
    for key in sorted(_PEAK_BF16_TFLOPS, key=len, reverse=True):
        if key in kind:
            return _PEAK_BF16_TFLOPS[key]
    return None


def mfu(cfg: StemGNNConfig, batch: int, step_time_s: float,
        device_kind: str) -> Dict[str, float]:
    """Achieved TFLOP/s and model-FLOP utilization for a measured step.

    Always returns a dict with {model_flops_per_step, achieved_tflops};
    the {peak_tflops_bf16, mfu_vs_bf16_peak} keys are included only when
    the device peak is known (omitted on e.g. CPU) — callers in
    bench.py/suite.py rely on the dict always existing."""
    peak = peak_tflops_bf16(device_kind)
    flops = train_step_flops(cfg, batch)
    achieved = flops / step_time_s / 1e12
    out = {
        "model_flops_per_step": flops,
        "achieved_tflops": achieved,
    }
    if peak is not None:
        out["peak_tflops_bf16"] = peak
        out["mfu_vs_bf16_peak"] = achieved / peak
    return out
