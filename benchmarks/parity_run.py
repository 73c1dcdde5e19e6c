"""Outcome-level accuracy parity driver (VERDICT r2 item 1).

Trains BOTH frameworks on the SAME CSV with the reference default config
(50 epochs, RMSProp, z_score, batch 32 — handler.py:103-191 semantics):

- torch side: benchmarks/torch_ref.py (the transcribed reference replica
  promoted to a runnable trainer);
- jax side: the production engine (stemgnn_tpu.train.engine.train/test),
  float32, the same path `python main.py` runs.

Both sides share the CSV ingest, normalization, and metric code where the
framework boundary allows, so the comparison isolates the training stack.
Results merge into benchmarks/parity_runs.json per (dataset, side); the
north-star bar is test MAE within 1% (BASELINE.md).

Usage:
    python benchmarks/parity_run.py --dataset ECG_data --side both
    python benchmarks/parity_run.py --dataset PeMS07 --side torch
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "parity_runs.json")


def run_jax(dataset: str, epoch: int, device: str, seed: int = 0) -> dict:
    """Train + test through the production engine (main.py flow), f32."""
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    from stemgnn_tpu.config import TrainConfig
    from stemgnn_tpu.data import ensure_dataset, load_csv, split_by_ratio
    from stemgnn_tpu.train.engine import test, train

    cfg = TrainConfig(dataset=dataset, epoch=epoch, compute_dtype="float32",
                      seed=seed,
                      data_dir=os.path.join(REPO, "dataset"),
                      output_dir=os.path.join(REPO, "output"))
    data = load_csv(ensure_dataset(cfg.dataset, cfg.data_dir))
    train_data, valid_data, test_data = split_by_ratio(
        data, cfg.train_length, cfg.valid_length, cfg.test_length
    )
    result_train = os.path.join(cfg.output_dir, dataset, f"parity_train_s{seed}")
    result_test = os.path.join(cfg.output_dir, dataset, f"parity_test_s{seed}")
    t0 = time.time()
    train(train_data, valid_data, cfg, result_train)
    perf = test(test_data, cfg, result_train, result_test)
    return {
        "framework": "stemgnn_tpu",
        "dataset": dataset,
        "device": str(jax.devices()[0]),
        "seed": seed,
        "epochs": epoch,
        "test_mae": float(perf["mae"]),
        "test_rmse": float(perf["rmse"]),
        "test_mape": float(perf["mape"]),
        "wall_s": round(time.time() - t0, 1),
        "command": (f"python main.py --dataset {dataset} --epoch {epoch} "
                    f"--compute_dtype float32 --seed {seed}"),
    }


def run_torch(dataset: str, epoch: int, seed: int = 0, threads: int = 0) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "benchmarks", "torch_ref.py"),
           "--dataset", dataset, "--epoch", str(epoch), "--seed", str(seed)]
    if threads:
        cmd += ["--threads", str(threads)]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"torch_ref failed:\n{proc.stdout}\n{proc.stderr}")
    with open(os.path.join(REPO, "output", dataset, "torch_ref",
                           f"result_s{seed}.json")) as f:
        res = json.load(f)
    return {
        "framework": "torch_reference_replica",
        "dataset": dataset,
        "seed": seed,
        "epochs": epoch,
        "test_mae": res["test_mae"],
        "test_rmse": res["test_rmse"],
        "test_mape": res["test_mape"],
        "wall_s": round(time.time() - t0, 1),
        "command": " ".join(cmd[1:]),
    }


def merge(entry: dict):
    # concurrent parity lanes (one per CPU core) all read-modify-write this
    # file; an exclusive lock keeps a lane's entry from being clobbered
    import fcntl

    lock_path = OUT_PATH + ".lock"
    lock_f = open(lock_path, "w")
    fcntl.flock(lock_f, fcntl.LOCK_EX)
    try:
        _merge_locked(entry)
    finally:
        fcntl.flock(lock_f, fcntl.LOCK_UN)
        lock_f.close()


def _merge_locked(entry: dict):
    blob = {"runs": []}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            blob = json.load(f)
    blob["runs"] = [r for r in blob["runs"]
                    if not (r["dataset"] == entry["dataset"]
                            and r["framework"] == entry["framework"]
                            and r.get("seed", 0) == entry.get("seed", 0))]
    blob["runs"].append(entry)
    # recompute the per-dataset comparison summary
    summary = {}
    by_ds = {}
    for r in blob["runs"]:
        by_ds.setdefault(r["dataset"], {}).setdefault(r["framework"], []).append(r)
    for ds, sides in by_ds.items():
        if len(sides) == 2:
            # keyed and SORTED by seed (advisor r3: a list ordered by merge
            # time silently misleads anything that assumes seed order)
            t_by_seed = {r.get("seed", 0): r["test_mae"]
                         for r in sides["torch_reference_replica"]}
            j_by_seed = {r.get("seed", 0): r["test_mae"]
                         for r in sides["stemgnn_tpu"]}
            ts = [t_by_seed[s] for s in sorted(t_by_seed)]
            js = [j_by_seed[s] for s in sorted(j_by_seed)]
            t_mean = sum(ts) / len(ts)
            j_mean = sum(js) / len(js)
            rel = abs(j_mean - t_mean) / t_mean
            summary[ds] = {
                "torch_mae_mean": round(t_mean, 6),
                "torch_mae_by_seed": {str(s): round(t_by_seed[s], 6)
                                      for s in sorted(t_by_seed)},
                "torch_mae_per_seed": [round(v, 6) for v in ts],
                "stemgnn_tpu_mae_mean": round(j_mean, 6),
                "stemgnn_tpu_mae_by_seed": {str(s): round(j_by_seed[s], 6)
                                            for s in sorted(j_by_seed)},
                "stemgnn_tpu_mae_per_seed": [round(v, 6) for v in js],
                "rel_mae_diff": round(rel, 4),
                "within_1pct": bool(rel <= 0.01),
            }
            if len(ts) > 1 or len(js) > 1:
                # framework-mean gap vs seed-to-seed variability. The
                # yardstick is the POOLED spread (max-min over both sides'
                # seeds): either side's own spread underestimates noise at
                # tiny n (ECG: torch n=2 spread 0.3% vs jax n=3 spread
                # 3.7% — same training recipe, so the pooled range is the
                # honest noise floor).
                summary[ds]["torch_seed_spread"] = round(max(ts) - min(ts), 6)
                summary[ds]["stemgnn_tpu_seed_spread"] = round(
                    max(js) - min(js), 6
                )
                pooled = max(ts + js) - min(ts + js)
                summary[ds]["pooled_seed_spread"] = round(pooled, 6)
                summary[ds]["gap_below_seed_noise"] = bool(
                    abs(j_mean - t_mean) <= pooled
                )
    blob["summary"] = summary
    with open(OUT_PATH, "w") as f:
        json.dump(blob, f, indent=2)
    print(json.dumps(entry))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, default="ECG_data")
    ap.add_argument("--epoch", type=int, default=50)
    ap.add_argument("--side", choices=["both", "torch", "jax"], default="both")
    ap.add_argument("--jax_device", type=str, default="",
                    help="'cpu' to force the CPU backend for the jax side")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch.set_num_threads for the torch side (this box "
                         "has 2 cores; 1 thread per lane lets two parity "
                         "lanes run concurrently without thrash)")
    args = ap.parse_args()

    if args.side in ("both", "torch"):
        merge(run_torch(args.dataset, args.epoch, args.seed, args.threads))
    if args.side in ("both", "jax"):
        merge(run_jax(args.dataset, args.epoch, args.jax_device, args.seed))


if __name__ == "__main__":
    main()
