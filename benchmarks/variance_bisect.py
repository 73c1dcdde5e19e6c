"""ECG seed-variance bisect (PARITY.md "known asymmetry"; ROADMAP item 0).

Post-dropout-fix, the torch replica's 4-seed ECG MAE spread is 0.59%
while stemgnn_tpu's is 3.0% — seeds 1/2 land ~3% above seed 0. This
experiment isolates the dropout BITSTREAM's contribution: re-run the
high seeds with identical init/shuffle (same --seed) but a decoupled
dropout stream (--dropout_seed, config.py). If the re-runs move back
into the torch band, the spread is dropout-mask luck (consistent with
the round-3 rbg-vs-threefry study, where the mask stream alone moved
ECG MAE ~3%); if they stay high, init/shuffle carry the variance.

Writes benchmarks/variance_bisect.json. Usage:
    python benchmarks/variance_bisect.py [--pairs 1:101,1:102,2:201]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "variance_bisect.json")


def run(dataset, epoch, seed, dropout_seed, shuffle_seed=-1,
        init_stream=None):
    """init_stream: None = TrainConfig default (since round 5 that is
    'torch' — the MT19937 mitigation); rows are stamped with the stream
    actually used.  Pre-round-5 rows in the JSON (no 'init_stream' key,
    no 'init' key) were the then-default threefry."""
    from stemgnn_tpu.config import TrainConfig
    from stemgnn_tpu.data import ensure_dataset, load_csv, split_by_ratio
    from stemgnn_tpu.train.engine import test, train

    kw = {} if init_stream is None else {"init_stream": init_stream}
    cfg = TrainConfig(dataset=dataset, epoch=epoch, compute_dtype="float32",
                      seed=seed, dropout_seed=dropout_seed,
                      shuffle_seed=shuffle_seed,
                      data_dir=os.path.join(REPO, "dataset"),
                      output_dir=os.path.join(REPO, "output"), **kw)
    data = load_csv(ensure_dataset(cfg.dataset, cfg.data_dir))
    tr, va, te = split_by_ratio(data, cfg.train_length, cfg.valid_length,
                                cfg.test_length)
    tag = f"bisect_s{seed}_d{dropout_seed}_h{shuffle_seed}_{cfg.init_stream}"
    rt = os.path.join(cfg.output_dir, dataset, tag + "_train")
    rs = os.path.join(cfg.output_dir, dataset, tag + "_test")
    t0 = time.time()
    train(tr, va, cfg, rt)
    perf = test(te, cfg, rt, rs)
    return {
        "dataset": dataset, "seed": seed, "dropout_seed": dropout_seed,
        "shuffle_seed": shuffle_seed, "init_stream": cfg.init_stream,
        "epochs": epoch, "test_mae": float(perf["mae"]),
        "test_rmse": float(perf["rmse"]),
        "wall_s": round(time.time() - t0, 1),
    }


def run_transplant(dataset, epoch, seed):
    """Torch-init-transplant arm: draw the INIT from the torch replica
    (torch.manual_seed(seed) -> _TorchStemGNN -> params_from_torch) and
    train it in OUR engine with our shuffle/dropout streams. If these
    runs land in the torch band (~1.014) while our native inits sit at
    ~1.040, some init distribution is subtly off despite the
    per-distribution tests; if they stay ~1.040, the init DRAWS are
    exchangeable and the asymmetry must be sampling luck after all."""
    import torch

    from stemgnn_tpu.config import TrainConfig
    from stemgnn_tpu.data import ensure_dataset, load_csv, split_by_ratio
    from stemgnn_tpu.train.engine import test, train
    from tests.test_torch_parity import _TorchStemGNN, params_from_torch

    cfg = TrainConfig(dataset=dataset, epoch=epoch, compute_dtype="float32",
                      seed=seed,
                      data_dir=os.path.join(REPO, "dataset"),
                      output_dir=os.path.join(REPO, "output"))
    data = load_csv(ensure_dataset(cfg.dataset, cfg.data_dir))
    tr, va, te = split_by_ratio(data, cfg.train_length, cfg.valid_length,
                                cfg.test_length)
    mcfg = cfg.model_config(data.shape[1])
    torch.manual_seed(seed)  # the reference's own init stream (main.py:52)
    tparams = params_from_torch(_TorchStemGNN(mcfg), mcfg)
    tag = f"transplant_s{seed}"
    rt = os.path.join(cfg.output_dir, dataset, tag + "_train")
    rs = os.path.join(cfg.output_dir, dataset, tag + "_test")
    t0 = time.time()
    train(tr, va, cfg, rt, init_params_override=tparams)
    perf = test(te, cfg, rt, rs)
    return {
        "dataset": dataset, "seed": seed, "init": "torch_transplant",
        "epochs": epoch, "test_mae": float(perf["mae"]),
        "test_rmse": float(perf["rmse"]),
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ECG_data")
    ap.add_argument("--epoch", type=int, default=50)
    ap.add_argument("--pairs", default="1:101,2:202",
                    help="comma list of seed:dropout_seed[:shuffle_seed]"
                         " re-runs (-1 = keep coupled to seed)")
    ap.add_argument("--transplant", default="",
                    help="comma list of seeds to run with TORCH-drawn inits"
                         " (replaces --pairs when set)")
    ap.add_argument("--init_stream", default=None,
                    help="override TrainConfig.init_stream for --pairs runs"
                         " (None = production default)")
    args = ap.parse_args()

    blob = {"runs": []}
    if os.path.exists(OUT):
        with open(OUT) as f:
            blob = json.load(f)
    if args.transplant:
        for seed in (int(v) for v in args.transplant.split(",")):
            res = run_transplant(args.dataset, args.epoch, seed)
            blob["runs"] = [r for r in blob["runs"]
                            if not (r.get("init") == "torch_transplant"
                                    and r["seed"] == seed
                                    and r["dataset"] == args.dataset)]
            blob["runs"].append(res)
            with open(OUT, "w") as f:
                json.dump(blob, f, indent=2)
            print(json.dumps(res), flush=True)
        return
    for pair in args.pairs.split(","):
        parts = [int(v) for v in pair.split(":")]
        seed, dseed = parts[0], parts[1]
        hseed = parts[2] if len(parts) > 2 else -1
        res = run(args.dataset, args.epoch, seed, dseed, hseed,
                  init_stream=args.init_stream)
        # pre-r5 rows carry no init_stream key == threefry; only replace
        # rows of the SAME stream so the two arms coexist
        blob["runs"] = [r for r in blob["runs"]
                        if not (r["seed"] == seed
                                and r.get("dropout_seed") == dseed
                                and r.get("shuffle_seed", -1) == hseed
                                and r.get("init_stream") == res["init_stream"]
                                and r["dataset"] == args.dataset)]
        blob["runs"].append(res)
        with open(OUT, "w") as f:
            json.dump(blob, f, indent=2)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
