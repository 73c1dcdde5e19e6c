"""Dense-vs-sparse mid-N crossover characterization (VERDICT r3 item 6).

Between "exact dense" (the reference regime, N<=358) and the approximate
sparse stretch configs there was no measured guidance on where exactness
stops being affordable. This driver measures, at N in {512..4096}, the
three graph/recurrence regimes:

  dense    — exact reference semantics: dense [N,N] latent graph + the
             hidden==N GRU (O(N^3) recurrent work: N sequential steps of
             3N^2 each);
  sparse_k — top-k sparse latent graph (ops/sparse.py, k=64), GRU still
             dense (isolates the graph-sparsity win);
  seg_gru  — sparse graph + hidden-decoupled segmented GRU
             (gru_hidden=128, gru_segment=512: O(N*H^2) recurrent work) —
             the full approximation stack (PARITY.md deviations).

All rows: window 12, horizon 3, multi 5, pallas bf16 (the production
default). Writes benchmarks/crossover.json with per-row step time /
windows/s and a computed `recommendation` block: the smallest N where
each approximation pays >=1.5x, i.e. where to flip the config knobs.

Step times at the top end run seconds, so rows use chunk_steps=1 and few
steps (the ~30 ms dispatch overhead is <1% there — bench.measure note).

Usage: python benchmarks/crossover.py [--ns 512,1024,2048,4096]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# (variant name, sparse_k, gru_hidden, gru_segment)
REGIMES = [
    ("dense", None, None, 0),
    ("sparse_k64", 64, None, 0),
    ("seg_gru", 64, 128, 512),
]
# per-N measurement knobs: batch, chunk_steps, steps, repeats — sized so
# a row stays under the TPU execution watchdog even at seconds/step
KNOBS = {
    512: dict(batch=8, chunk_steps=16, steps=32, repeats=3),
    1024: dict(batch=8, chunk_steps=8, steps=16, repeats=3),
    2048: dict(batch=4, chunk_steps=2, steps=4, repeats=2),
    4096: dict(batch=4, chunk_steps=1, steps=2, repeats=1),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=str, default="512,1024,2048,4096")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "crossover.json"))
    args = ap.parse_args()

    import jax

    from bench import measure

    rows = []
    for n in [int(s) for s in args.ns.split(",")]:
        knobs = KNOBS.get(n, dict(batch=4, chunk_steps=1, steps=2, repeats=1))
        for name, sparse_k, gru_hidden, gru_segment in REGIMES:
            try:
                res = measure(
                    batch=knobs["batch"], steps=knobs["steps"],
                    chunk_steps=knobs["chunk_steps"],
                    repeats=knobs["repeats"], warmup=knobs["chunk_steps"],
                    use_pallas=True, precision="bfloat16",
                    n_nodes=n, window=12, horizon=3, multi=5,
                    sparse_k=sparse_k, gru_hidden=gru_hidden,
                    gru_segment=gru_segment,
                )
            except Exception as e:
                print(f"N={n}/{name}: FAILED {type(e).__name__}: {e}",
                      file=sys.stderr)
                continue
            row = {
                "n": n, "regime": name, "batch": knobs["batch"],
                "sparse_k": sparse_k, "gru_hidden": gru_hidden,
                "gru_segment": gru_segment,
                "step_time_ms": round(res["step_time_ms"], 2),
                "windows_per_s": round(res["windows_per_s"], 2),
                "spread": round(res["spread"], 4),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    # crossover analysis: speedup of each approximation vs dense at each N
    by_n = {}
    for r in rows:
        by_n.setdefault(r["n"], {})[r["regime"]] = r["step_time_ms"]
    speedups = {
        str(n): {
            reg: round(t["dense"] / t[reg], 2)
            for reg in ("sparse_k64", "seg_gru") if reg in t and "dense" in t
        }
        for n, t in sorted(by_n.items())
    }
    rec = {}
    for reg in ("sparse_k64", "seg_gru"):
        ns = [int(n) for n, s in speedups.items()
              if s.get(reg, 0) >= 1.5]
        rec[reg] = min(ns) if ns else None
    out = {
        "device": str(jax.devices()[0]),
        "variant": "pallas_bf16",
        "rows": rows,
        "speedup_vs_dense": speedups,
        "recommendation": {
            "sparse_k64_worth_it_from_n": rec["sparse_k64"],
            "seg_gru_worth_it_from_n": rec["seg_gru"],
            "note": ("smallest measured N where the approximation is "
                     ">=1.5x faster than exact dense; below that, stay "
                     "exact (reference semantics)"),
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
