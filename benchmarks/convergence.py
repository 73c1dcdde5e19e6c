"""bf16 convergence evidence (VERDICT r2 weak #4): run the full default
ECG training twice — compute_dtype float32 vs bfloat16 (the shipping
bench default) — and record both test metrics in
benchmarks/convergence.json so the bf16-default justification is a
checkable artifact, not a comment.

Usage: python benchmarks/convergence.py [--epoch 50] [--dataset ECG_data]
       [--use_pallas True]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "convergence.json")


def run(dataset, epoch, compute_dtype, use_pallas):
    import dataclasses

    from stemgnn_tpu.config import TrainConfig
    from stemgnn_tpu.data import ensure_dataset, load_csv, split_by_ratio
    from stemgnn_tpu.train.engine import test, train

    cfg = TrainConfig(dataset=dataset, epoch=epoch,
                      compute_dtype=compute_dtype, use_pallas=use_pallas,
                      data_dir=os.path.join(REPO, "dataset"),
                      output_dir=os.path.join(REPO, "output"))
    data = load_csv(ensure_dataset(cfg.dataset, cfg.data_dir))
    tr, va, te = split_by_ratio(data, cfg.train_length, cfg.valid_length,
                                cfg.test_length)
    tag = f"conv_{compute_dtype}" + ("_pallas" if use_pallas else "")
    rt = os.path.join(cfg.output_dir, dataset, tag + "_train")
    rs = os.path.join(cfg.output_dir, dataset, tag + "_test")
    t0 = time.time()
    train(tr, va, cfg, rt)
    perf = test(te, cfg, rt, rs)
    return {
        "compute_dtype": compute_dtype,
        "use_pallas": use_pallas,
        "epochs": epoch,
        "test_mae": float(perf["mae"]),
        "test_rmse": float(perf["rmse"]),
        "test_mape": float(perf["mape"]),
        "wall_s": round(time.time() - t0, 1),
        "command": (f"python main.py --dataset {dataset} --epoch {epoch} "
                    f"--compute_dtype {compute_dtype} "
                    f"--use_pallas {use_pallas}"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, default="ECG_data")
    ap.add_argument("--epoch", type=int, default=50)
    ap.add_argument("--use_pallas", type=lambda v: v.lower() in ("1", "true"),
                    default=True)
    args = ap.parse_args()

    import jax

    runs = []
    for dtype in ("float32", "bfloat16"):
        res = run(args.dataset, args.epoch, dtype, args.use_pallas)
        runs.append(res)
        print(json.dumps(res), flush=True)
    f32, bf16 = runs
    blob = {
        "dataset": args.dataset,
        "device": str(jax.devices()[0]),
        "runs": runs,
        "mae_rel_diff_bf16_vs_f32": round(
            abs(bf16["test_mae"] - f32["test_mae"]) / f32["test_mae"], 4
        ),
    }
    with open(OUT, "w") as f:
        json.dump(blob, f, indent=2)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
