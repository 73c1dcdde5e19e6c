"""In-step A/B of spectral fused-backward variants (VERDICT r4 item 3).

The fused bwd (2 x 0.143 ms) is the largest trace bucket (38%); round 4
left its design un-probed. Variants measured IN-STEP (bench.measure,
median-of-3 chunked64 — standalone op timings overstate composed cost,
CLAUDE.md round-3 lesson):

- transpose_free on/off: dot_general row/out-axis contractions vs the
  original explicit u.T / wl.T / ci.T VMEM transposes;
- BWD_ROW_TILE 128 (round-2 choice) vs 256 (the fwd kernel's tile);
- --phase save_acts: recompute-vs-reread — the fwd kernel saves each
  GLU's (a, s) and the bwd rereads them instead of recomputing
  (12 matmuls + 6 sigmoid sweeps traded for ~82 MB/step of HBM act
  round-trips at f32 storage, half that at bf16 storage).

Writes benchmarks/spectral_bwd_ab.json (phase save_acts appends under
"save_acts_rows"). Run on the TPU (one process!).

Usage: python benchmarks/spectral_bwd_ab.py [--steps 128] [--phase save_acts]
"""

import argparse
import itertools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "spectral_bwd_ab.json")


def run_save_acts(args):
    """Phase 2 (round 5): recompute-vs-reread, at the shipping defaults
    (tfree=False, tile=128, pallas GRU on)."""
    from bench import measure
    from stemgnn_tpu.ops import pallas_spectral as ps

    variants = [
        ("recompute(default)", False, True),
        ("reread_f32acts", True, True),
        ("reread_bf16acts", True, False),
        ("recompute(sentinel)", False, True),
    ]
    rows = []
    for name, save, f32acts in variants:
        ps.SAVE_ACTS_BWD = save
        ps.SAVE_ACTS_F32 = f32acts
        res = measure(batch=32, steps=args.steps, use_pallas=True,
                      precision="bfloat16", repeats=args.repeats)
        row = {
            "variant": name, "save_acts": save, "acts_f32": f32acts,
            "step_time_ms": round(res["step_time_ms"], 4),
            "step_time_ms_min": round(res["step_time_ms_min"], 4),
            "step_time_ms_max": round(res["step_time_ms_max"], 4),
            "spread": round(res["spread"], 4),
            "windows_per_s": round(res["windows_per_s"], 1),
            "loss": res["loss"],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    blob = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            blob = json.load(f)
    blob["save_acts_rows"] = rows
    blob["save_acts_ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(OUT, "w") as f:
        json.dump(blob, f, indent=2)
    print(f"wrote {OUT}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--phase", choices=["tfree", "save_acts"],
                    default="tfree")
    args = ap.parse_args()

    if args.phase == "save_acts":
        run_save_acts(args)
        return

    from bench import measure
    from stemgnn_tpu.ops import pallas_spectral as ps

    rows = []
    # interleave variants A/B/A/B? No — bench.measure already medians
    # over >=3 repeats; run the 4 variants back to back, then re-run the
    # default LAST as a drift sentinel.
    grid = list(itertools.product([True, False], [128, 256]))
    grid.append((True, 128))  # drift sentinel: default re-measured last
    for i, (tfree, tile) in enumerate(grid):
        ps.TRANSPOSE_FREE_BWD = tfree
        ps.BWD_ROW_TILE = tile
        res = measure(batch=32, steps=args.steps, use_pallas=True,
                      precision="bfloat16", repeats=args.repeats)
        row = {
            "variant": f"tfree={tfree},tile={tile}"
                       + ("(sentinel)" if i == len(grid) - 1 else ""),
            "transpose_free": tfree, "bwd_row_tile": tile,
            "step_time_ms": round(res["step_time_ms"], 4),
            "step_time_ms_min": round(res["step_time_ms_min"], 4),
            "step_time_ms_max": round(res["step_time_ms_max"], 4),
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
