"""Per-kernel roofline / speed-of-light accounting (VERDICT r2 item 3).

For each hot op (spectral cell, SDDMM attention, Chebyshev conv, GRU
recurrence) on the flagship shapes: measure fwd and fwd+bwd steady-state
time, compute analytic FLOPs and minimum HBM bytes, and report achieved
TFLOP/s and GB/s against the chip's published peaks (v5e: 394 bf16
TFLOP/s, ~819 GB/s HBM). The bound classification (compute vs memory)
comes from arithmetic intensity vs the ridge point.

Timing methodology: each op runs `--iters` times inside ONE jitted
lax.scan whose carry perturbs the input by a vanishing factor — that
defeats loop-invariant hoisting without changing the math — so the
tunneled axon dispatch noise (~1 ms/call, CLAUDE.md) amortizes away.

Writes benchmarks/roofline.json. Usage:
    python benchmarks/roofline.py [--iters 64] [--pallas|--no-pallas]
    [--bf16|--f32] [--n 140] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# chip peaks for the roofline axes (bf16 matmul TFLOP/s from
# utils/flops.py; HBM GB/s from published specs)
HBM_GBPS = {"v5 lite": 819.0, "v5e": 819.0, "v4": 1228.0, "v5p": 2765.0,
            "v6 lite": 1640.0, "v6e": 1640.0}


def hbm_gbps(device_kind: str):
    kind = device_kind.lower()
    for key in sorted(HBM_GBPS, key=len, reverse=True):
        if key in kind:
            return HBM_GBPS[key]
    return None


def main():
    ap = argparse.ArgumentParser()
    # the tunneled dispatch costs ~20-30 ms per timed program invocation;
    # the whole loop is ONE invocation, so iters must be large enough to
    # push that fixed cost well below the per-iteration op time (measured:
    # at 64 iters every sub-0.5ms op reads ~0.45 ms/iter — pure overhead)
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--n", type=int, default=140, help="node count (flagship 140)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--window", type=int, default=12)
    ap.add_argument("--multi", type=int, default=5)
    ap.add_argument("--pallas", dest="pallas", action="store_true", default=True)
    ap.add_argument("--no-pallas", dest="pallas", action="store_false")
    ap.add_argument("--bf16", dest="bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str,
                    default=os.path.join(os.path.dirname(__file__), "roofline.json"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from stemgnn_tpu import ops
    from stemgnn_tpu.config import StemGNNConfig
    from stemgnn_tpu.models import stemgnn
    from stemgnn_tpu.utils.flops import peak_tflops_bf16

    b, n, w, m = args.batch, args.n, args.window, args.multi
    wm = w * m
    gin, gout = 4 * w, 4 * w * m
    precision = "bfloat16" if args.bf16 else "float32"
    dt = 2 if args.bf16 else 4  # operand bytes (params stay f32: 4)
    device = jax.devices()[0]
    peak_tf = peak_tflops_bf16(device.device_kind)
    peak_bw = hbm_gbps(device.device_kind)

    cfg = StemGNNConfig(units=n, window_size=w, horizon=3, multi_layer=m)
    params = stemgnn.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    def timed(fn, x, iters):
        """Steady-state seconds/iteration of fn(x) under one jitted scan.

        The carry feeds back a vanishing perturbation of the input so XLA
        cannot hoist the op out of the loop (each iteration depends on the
        previous one), while the math stays numerically that of fn(x)."""

        @jax.jit
        def loop(x):
            def body(c, _):
                out = fn(x * (1.0 + c))
                s = jnp.sum(out.astype(jnp.float32))
                return s * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        with jax.default_matmul_precision(precision):
            float(loop(x))  # compile + warm
            t0 = time.perf_counter()
            val = float(loop(x))  # value transfer closes the timing (CLAUDE.md)
            elapsed = time.perf_counter() - t0
        assert np.isfinite(val)
        return elapsed / iters

    def grad_version(fn):
        g = jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32)))
        return g

    results = []

    def record(name, fn, x, flops, bytes_moved):
        t_fwd = timed(fn, x, args.iters)
        t_bwd = timed(grad_version(fn), x, args.iters)
        intensity = flops / bytes_moved
        ridge = (peak_tf * 1e12) / (peak_bw * 1e9) if peak_tf and peak_bw else None
        row = {
            "op": name,
            "shape": list(np.shape(x)),
            "fwd_ms": round(t_fwd * 1e3, 4),
            "fwd_bwd_ms": round(t_bwd * 1e3, 4),
            "flops_fwd": flops,
            "min_bytes_fwd": bytes_moved,
            "intensity_flop_per_byte": round(intensity, 2),
            "achieved_tflops_fwd": round(flops / t_fwd / 1e12, 3),
            "achieved_gbps_fwd": round(bytes_moved / t_fwd / 1e9, 2),
        }
        if peak_tf:
            row["pct_of_bf16_peak_fwd"] = round(100 * flops / t_fwd / 1e12 / peak_tf, 2)
        if peak_bw:
            row["pct_of_hbm_peak_fwd"] = round(
                100 * bytes_moved / t_fwd / 1e9 / peak_bw, 2)
        if ridge:
            row["bound"] = "compute" if intensity > ridge else "memory"
        results.append(row)
        print(json.dumps(row), flush=True)

    # --- spectral cell: DFT -> 3xGLU (real/imag) -> iDFT -----------------
    spe = ops.select_spe_seq_cell(args.pallas, precision)
    x_spe = jnp.asarray(rng.standard_normal((b, 4, n, w)), jnp.float32)
    glu_params = params["blocks"][0]["glu"]
    spe_flops = (
        2 * 2.0 * b * 4 * n * w * w          # DFT cos+sin matmuls
        + 2 * 2.0 * b * 4 * n * wm * wm      # iDFT on the widened axis
        + 8.0 * b * n * gin * gout + 16.0 * b * n * gout * gout  # 6 GLUs x2
    )
    glu_param_bytes = sum(4 * int(np.prod(p.shape))
                          for p in jax.tree.leaves(glu_params))
    spe_bytes = dt * (b * 4 * n * w) + dt * (b * 4 * n * wm) + glu_param_bytes
    record("spe_seq_cell", lambda x: spe(x, glu_params, m), x_spe,
           spe_flops, spe_bytes)

    # --- SDDMM attention: rank-1 scores + LeakyReLU + row softmax --------
    att = ops.select_attention(args.pallas)
    enc = jnp.asarray(rng.standard_normal((b, n, n)), jnp.float32)
    att_flops = 4.0 * b * n * n  # key/query projections (matmul part)
    att_bytes = dt * (b * n * n) * 2 + 4 * 2 * n  # read enc, write probs
    record("attention_sddmm",
           lambda e: att(e, params["weight_key"], params["weight_query"], 0.2),
           enc, att_flops, att_bytes)

    # --- Chebyshev graph conv: mul_L [4,N,N] @ x [B,N,W] -----------------
    conv = ops.select_graph_conv(args.pallas, precision)
    mul_L = jnp.asarray(rng.standard_normal((4, n, n)), jnp.float32)
    x_conv = jnp.asarray(rng.standard_normal((b, n, w)), jnp.float32)
    conv_flops = 2.0 * 4 * b * n * n * w
    conv_bytes = dt * (4 * n * n + b * n * w + b * 4 * n * w)
    record("cheb_graph_conv", lambda x: conv(mul_L, x), x_conv,
           conv_flops, conv_bytes)

    # --- GRU over nodes: N sequential [B,N]@[N,3N] steps -----------------
    gru_fn = ops.select_gru(False, n)
    x_gru = jnp.asarray(rng.standard_normal((b, w, n)), jnp.float32)
    gru_flops = 2.0 * n * b * w * 3 * n + 6.0 * b * n * n * n
    gru_bytes = dt * (b * w * n + b * n * n) + 4 * (3 * n * w + 3 * n * n)
    record("gru_over_nodes", lambda x: gru_fn(params["gru"], x), x_gru,
           gru_flops, gru_bytes)

    out = {
        "device": str(device),
        "device_kind": device.device_kind,
        "peak_tflops_bf16": peak_tf,
        "peak_hbm_gbps": peak_bw,
        "precision": precision,
        "pallas": args.pallas,
        "config": {"n": n, "batch": b, "window": w, "multi": m},
        "iters": args.iters,
        "rows": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
