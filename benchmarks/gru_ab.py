"""In-step A/B of the GRU recurrence variants (VERDICT r4 item 7).

The GRU scan bucket is 0.208 ms/step (22%) of the flagship device time.
The fused Pallas kernel (ops/pallas_gru.py — persistent VMEM hidden
state, resident fused [H,3H] weights, UNROLL=8 grid blocks, activations
saved for an elementwise backward) tied the XLA scan on the standalone
forward and lost composed in round 2; the composed step has changed
since (folded-DFT spectral kernel, transpose-free spectral bwd), so this
re-decides IN-STEP:

  - scan (default), scan+remat, pallas_gru, and pallas_gru with
    UNROLL in {4, 8, 16}.

Writes benchmarks/gru_ab.json. Run on the TPU (one process!).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "gru_ab.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from bench import measure
    from stemgnn_tpu.ops import pallas_gru as pg

    variants = [
        ("scan", {"pallas_gru": False}, None),
        ("scan_remat", {"pallas_gru": False, "gru_remat": True}, None),
        ("pallas_gru_u8", {"pallas_gru": True}, 8),
        ("pallas_gru_u4", {"pallas_gru": True}, 4),
        ("pallas_gru_u16", {"pallas_gru": True}, 16),
        ("scan(sentinel)", {"pallas_gru": False}, None),  # drift sentinel
    ]
    rows = []
    for name, kw, unroll in variants:
        if unroll is not None:
            pg.UNROLL = unroll
        res = measure(batch=32, steps=args.steps, use_pallas=True,
                      precision="bfloat16", repeats=args.repeats, **kw)
        row = {
            "variant": name,
            "step_time_ms": round(res["step_time_ms"], 4),
            "step_time_ms_min": round(res["step_time_ms_min"], 4),
            "spread": round(res["spread"], 4),
            "windows_per_s": round(res["windows_per_s"], 1),
            "loss": res["loss"],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(OUT, "w") as f:
        json.dump({"rows": rows, "config": "ECG N=140 B=32 pallas bf16",
                   "ts": time.strftime("%Y-%m-%d %H:%M:%S")}, f, indent=2)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
