"""Multi-config benchmark suite (SURVEY.md §7 step 6).

Measures steady-state training throughput (windows/s, edges/s through the
Chebyshev graph conv) across the reference's dataset configs
(README.md:71-80 node counts / windows / horizons) and kernel variants
(jnp vs Pallas, float32 vs bfloat16), on whatever device JAX resolves
(the attached TPU chip under axon; CPU otherwise).

Writes benchmarks/results.json:
  {"device": ..., "rows": [{"config", "n_nodes", "window", "horizon",
    "variant", "windows_per_s", "step_time_ms", "edges_per_s"}, ...]}

Usage: python benchmarks/suite.py [--steps N] [--configs ECG,PEMS07,...]
       [--variants jnp_f32,pallas_f32,jnp_bf16,pallas_bf16] [--large]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# dataset configs: (n_nodes, window, horizon, multi, batch)
# node counts per reference README.md:74-80; window/horizon per the
# horizon-3 config table (COVID-19 uses 28/28, README.md:101)
CONFIGS = {
    "COVID-19": (25, 28, 28, 5, 32),
    "ECG": (140, 12, 3, 5, 32),
    "PEMS08": (170, 12, 3, 5, 32),
    "METR-LA": (207, 12, 3, 5, 32),
    "PEMS07": (228, 12, 3, 5, 32),
    "PEMS04": (307, 12, 3, 5, 32),
    "PEMS-BAY": (325, 12, 3, 5, 32),
    "PEMS03": (358, 12, 3, 5, 32),
}
# stretch: large latent graphs (quadratic N^2 terms dominate; SURVEY §3.3).
# 6th field: sparse_k for the top-k sparse latent-graph path (ops/sparse.py);
# None = dense. 7th/8th (optional): gru_hidden / gru_segment — the
# hidden-decoupled segmented GRU deviation (PARITY.md): the reference's
# unit==N GRU is 3N² recurrent weights and N sequential steps of N² work
# = O(N³) (measured 4.8 s/step at N=4096 B=4, ~all GRU); rows with
# gru_hidden replace it with O(N·H²) compute at sequential depth
# gru_segment, making 32k-100k nodes finite.
LARGE_CONFIGS = {
    "synthetic-1k": (1024, 12, 3, 5, 8, None),
    "synthetic-4k-sparse64": (4096, 12, 3, 5, 4, 64),
    "synthetic-8k-sparse64": (8192, 12, 3, 5, 2, 64),
    "synthetic-4k-seggru": (4096, 12, 3, 5, 4, 64, 128, 512),
    "synthetic-32k-seggru": (32768, 12, 3, 5, 2, 64, 64, 1024),
    "synthetic-100k-seggru": (102400, 12, 3, 2, 1, 64, 64, 1024),
    # 9th field: force_sparse_shard — route through the PRODUCTION
    # node-sharded graph path (parallel/sparse_shard.py shard_map) on a
    # 1x1 mesh: the collectives degenerate but the kernel/dispatch
    # structure is the multi-chip one, compiled natively on the TPU
    # (round-5 VERDICT item 2's measurable single-chip slice).
    "synthetic-32k-sharded": (32768, 12, 3, 5, 2, 64, 64, 1024, True),
}

VARIANTS = {
    "jnp_f32": (False, "float32"),
    "pallas_f32": (True, "float32"),
    "jnp_bf16": (False, "bfloat16"),
    "pallas_bf16": (True, "bfloat16"),
}


def main():
    ap = argparse.ArgumentParser()
    # steps round DOWN to whole scan chunks, warmup rounds UP (bench.measure)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--warmup", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed repeats per row; median is recorded")
    ap.add_argument("--configs", type=str, default="ECG,PEMS07,PEMS03,COVID-19")
    # the shipping default (pallas_bf16) is measured by default — a matrix
    # that omits the production variant goes stale invisibly (round-2 lesson)
    ap.add_argument("--variants", type=str,
                    default="jnp_f32,pallas_f32,jnp_bf16,pallas_bf16")
    ap.add_argument("--large", action="store_true", help="include synthetic large-N configs")
    ap.add_argument("--chunk", type=int, default=0,
                    help="override scan-chunk size (steps per device dispatch)."
                         " Use 1 for configs whose single step runs seconds"
                         " (dense-GRU sparse stretch rows) — a 16-step chunk"
                         " there exceeds the TPU execution watchdog and"
                         " crashes the worker (see bench.measure docstring)")
    ap.add_argument("--out", type=str,
                    default=os.path.join(os.path.dirname(__file__), "results.json"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests; no TPU contention)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from bench import measure

    table = dict(CONFIGS)
    if args.large:
        table.update(LARGE_CONFIGS)

    # merge-on-write: keep rows from a previous run for (config, variant)
    # pairs not re-measured here, and persist after EVERY row so a crash
    # or timeout mid-matrix loses at most the in-flight measurement
    rows = []
    prior = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f).get("rows", [])

    def flush():
        measured = {(r["config"], r["variant"]) for r in rows}
        kept = [r for r in prior if (r["config"], r["variant"]) not in measured]
        out = {"device": str(jax.devices()[0]), "rows": kept + rows}
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        return len(kept) + len(rows)

    for name in args.configs.split(","):
        name = name.strip()
        if name not in table:
            print(f"skip unknown config {name}", file=sys.stderr)
            continue
        row_cfg = table[name]
        n, w, h, m, b = row_cfg[:5]
        sparse_k = row_cfg[5] if len(row_cfg) > 5 else None
        gru_hidden = row_cfg[6] if len(row_cfg) > 6 else None
        gru_segment = row_cfg[7] if len(row_cfg) > 7 else 0
        force_shard = bool(row_cfg[8]) if len(row_cfg) > 8 else False
        mesh = None
        if force_shard:
            from stemgnn_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(1, 1, jax.devices()[:1])
        for vname in args.variants.split(","):
            use_pallas, precision = VARIANTS[vname.strip()]
            try:
                res = measure(
                    batch=b, steps=args.steps, warmup=args.warmup,
                    use_pallas=use_pallas, precision=precision,
                    n_nodes=n, window=w, horizon=h, multi=m, sparse_k=sparse_k,
                    gru_hidden=gru_hidden, gru_segment=gru_segment,
                    chunk_steps=args.chunk or None, repeats=args.repeats,
                    mesh=mesh, force_sparse_shard=force_shard,
                )
            except Exception as e:  # e.g. Pallas shape limits on a config
                print(f"{name}/{vname}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
                continue
            row = {
                "config": name, "n_nodes": n, "window": w, "horizon": h,
                "batch": b, "variant": vname, "sparse_k": sparse_k,
                "force_sparse_shard": force_shard,
                "windows_per_s": round(res["windows_per_s"], 2),
                "step_time_ms": round(res["step_time_ms"], 3),
                "step_time_ms_min": round(res["step_time_ms_min"], 3),
                "repeats": res["repeats"],
                "spread": round(res["spread"], 4),
                # edges keyed on the DISPATCHED path (advisor r4): pallas
                # graph kernel skips the zero T0 order -> 3 executed; jnp
                # runs the dense 4-order einsum -> 4. raw4 is the
                # cross-variant comparable count.
                "edges_per_s": round(res["edges_per_s"]),
                "edges_per_s_raw4": round(res["edges_per_s_raw4"]),
                "executed_cheb_orders": res["executed_cheb_orders"],
                # effective dispatch: pallas variants fall back to jnp below
                # pallas_min_nodes (e.g. COVID-19 N=25), and the attention
                # kernel has its own knob + sparse path — label per kernel
                "pallas_effective": res["pallas_effective"],
                "pallas_attention_effective": res["pallas_attention_effective"],
                # speed-of-light accounting (utils/flops.py): analytic step
                # FLOPs, achieved TFLOP/s, fraction of the chip's bf16 peak
                "model_flops_per_step": res["mfu"]["model_flops_per_step"],
                "achieved_tflops": round(res["mfu"]["achieved_tflops"], 3),
                "mfu_vs_bf16_peak": round(res["mfu"]["mfu_vs_bf16_peak"], 4)
                if "mfu_vs_bf16_peak" in res["mfu"] else None,
            }
            if gru_hidden:
                row["gru_hidden"] = gru_hidden
                row["gru_segment"] = gru_segment
            rows.append(row)
            print(json.dumps(row), flush=True)
            flush()

    total = flush()
    print(f"wrote {args.out} ({total} rows)")


if __name__ == "__main__":
    main()
