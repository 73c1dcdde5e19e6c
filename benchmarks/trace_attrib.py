"""Profiler-trace step attribution (VERDICT r3 item 3).

Round-3 left ~0.45 ms of the 1.48 ms marginal step unattributed (sum of
per-op 512-iter timings = 0.86 ms). This tool closes the loop with the
profiler instead of more stopwatch probes: it runs warmup + one timed
scan-chunk of the production epoch program under `jax.profiler.trace`,
parses the XSpace with `jax.profiler.ProfileData`, aggregates device-
plane event durations by op name, and buckets them into the model's
logical phases (spectral cell, GRU scan, attention, cheb conv, matmul
heads/contraction, optimizer, dropout/PRNG, collectives/infeed, other).

Writes benchmarks/trace_attrib.json with:
  - per-bucket device-time per train step (ms) and share of the step,
  - the top-N individual ops with their HLO names for spot-checking,
  - coverage: sum(buckets)/step_time — the "attributed" fraction.

Usage: python benchmarks/trace_attrib.py [--steps 64] [--pallas/-np]
       [--bf16/--f32] [--top 40]
"""

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bucket_for(name: str) -> str:
    """Bucket an HLO op (full text, shapes embedded) into a model phase.

    Shape-based heuristics tied to the flagship config (N=140, W=12, m=5,
    B=32 -> GLU dims 48x240, attention rows pad 140->256, epoch scan
    carries the [4096,140] dataset). Good enough for >=90% attribution of
    THIS config's step; re-derive patterns before trusting other shapes."""
    n = name
    if "tpu_custom_call" in n:
        if "48,240]" in n:
            return "spectral_pallas"
        if "256,1]" in n or ",1,140]" in n or "256,140]" in n:
            return "attention_pallas"
        if "140,140]" in n:
            return "cheb_pallas"
        if ",32,140]" in n:
            # persistent-VMEM GRU kernel (ops/pallas_gru.py): fwd/bwd
            # custom-calls carry [T_pad, B, N]-shaped operands
            return "gru_pallas"
        return "pallas_other"
    if n.startswith("%while"):
        if "4096,140]" in n:
            return "epoch_scan_overhead"  # self-time of the batch scan
        return "gru_scan"
    if re.search(r"threefry|random|shift-right|xor", n):
        return "dropout_prng"
    if re.search(r"convolution|dot|gemm", n):
        return "matmul_other"
    if re.search(r"dynamic-update-slice|rsqrt", n):
        return "optimizer_update"
    if re.search(r"copy|transpose|pad|bitcast|broadcast|reshape|gather|"
                 r"dynamic-slice|select|concatenate", n):
        return "data_movement"
    return "other"


def run_and_trace(steps: int, use_pallas: bool, precision: str,
                  trace_dir: str, batch: int = 32):
    import jax
    import jax.numpy as jnp

    from stemgnn_tpu.config import StemGNNConfig
    from stemgnn_tpu.models import stemgnn
    from stemgnn_tpu.train.engine import make_epoch_fn
    from stemgnn_tpu.train.optim import make_optimizer

    cfg = StemGNNConfig(units=140, window_size=12, horizon=3, multi_layer=5)
    params = stemgnn.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer("RMSProp", 1e-4)
    opt_state = opt.init(params)
    epoch_fn = make_epoch_fn(cfg, opt, use_pallas, precision)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((4096, 140)), dtype=jnp.float32)
    his = [jnp.asarray(rng.integers(12, 4093, size=(steps, batch)), jnp.int32)
           for _ in range(2)]
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    import time

    # warmup chunk (compile)
    params, opt_state, losses = epoch_fn(
        params, opt_state, data, his[0], jax.random.split(keys[0], steps))
    float(losses[-1])
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        params, opt_state, losses = epoch_fn(
            params, opt_state, data, his[1], jax.random.split(keys[1], steps))
        final = float(losses[-1])
    wall = time.perf_counter() - t0
    return wall, final


def _self_times(events):
    """Self-time per event from interval nesting on one trace line.

    Events on an XLA-op line nest (a `while` contains its body's ops as
    separate events with sub-intervals). Total-duration aggregation
    double-counts containers; self = duration - sum(direct children)."""
    evs = sorted(((e.start_ns, e.end_ns, e.name) for e in events),
                 key=lambda t: (t[0], -t[1]))
    out = collections.Counter()
    stack = []  # [end_ns, name, start_ns, child_sum, ctx]

    def close(top):
        end, name, start, child, ctx = top
        out[(ctx, name)] += (end - start) - child

    for s, e, name in evs:
        while stack and s >= stack[-1][0]:
            close(stack.pop())
        dur = e - s
        # context inheritance: ops nested inside a GRU `while` ARE the GRU
        # recurrence body — without it their self-times scatter into the
        # generic fusion/data-movement buckets and the GRU looks free
        ctx = stack[-1][4] if stack else ""
        if not ctx and bucket_for(name) == "gru_scan":
            ctx = "gru_scan"
        if stack:
            stack[-1][3] += dur
        stack.append([e, name, s, 0, ctx])
    while stack:
        close(stack.pop())
    return out


def parse_trace(trace_dir: str, steps: int, top: int):
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    pd = ProfileData.from_serialized_xspace(open(paths[0], "rb").read())
    per_op = collections.Counter()
    plane_totals = {}
    device_planes = []
    for pl in pd.planes:
        total = 0
        is_device = ("TPU" in pl.name or "/device:" in pl.name) and \
            "metadata" not in pl.name.lower()
        for ln in pl.lines:
            line_total = sum(e.duration_ns for e in ln.events)
            total = max(total, line_total)  # lines overlap; take the longest
            if is_device and "XLA Ops" in ln.name:
                per_op.update(_self_times(ln.events))
        plane_totals[pl.name] = total / 1e6
        if is_device:
            device_planes.append(pl.name)
    return per_op, plane_totals, device_planes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32,
                    help="batch size (the B=64 scaling-cliff probe,"
                         " VERDICT r4 item 5)")
    ap.add_argument("--pallas", dest="pallas", action="store_true",
                    default=True)
    ap.add_argument("--no-pallas", dest="pallas", action="store_false")
    ap.add_argument("--bf16", dest="bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "trace_attrib.json"))
    args = ap.parse_args()

    precision = "bfloat16" if args.bf16 else "float32"
    with tempfile.TemporaryDirectory() as td:
        wall, final = run_and_trace(args.steps, args.pallas, precision, td,
                                    batch=args.batch)
        per_op, plane_totals, device_planes = parse_trace(
            td, args.steps, args.top)

    step_ms = wall / args.steps * 1e3
    buckets = collections.Counter()
    for (ctx, name), ns in per_op.items():
        buckets[ctx or bucket_for(name)] += ns
    dev_total_ms = sum(per_op.values()) / 1e6
    out = {
        "config": {"steps": args.steps, "pallas": args.pallas,
                   "precision": precision, "n": 140, "batch": args.batch},
        "wall_step_ms": round(step_ms, 4),
        "device_time_per_step_ms": round(dev_total_ms / args.steps, 4),
        "device_planes": device_planes,
        "plane_totals_ms": {k: round(v, 3) for k, v in plane_totals.items()},
        "buckets_ms_per_step": {
            b: round(ns / 1e6 / args.steps, 4)
            for b, ns in buckets.most_common()
        },
        "buckets_pct_of_device": {
            b: round(100.0 * ns / max(1, sum(per_op.values())), 1)
            for b, ns in buckets.most_common()
        },
        "top_ops_ms_per_step": [
            # HLO text truncated: the full op string embeds every operand
            # shape/layout and runs to kilobytes
            {"op": name[:160], "ms": round(ns / 1e6 / args.steps, 4),
             "bucket": ctx or bucket_for(name)}
            for (ctx, name), ns in per_op.most_common(args.top)
        ],
        "loss": final,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in (
        "wall_step_ms", "device_time_per_step_ms", "buckets_ms_per_step")}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
