"""Runnable REFERENCE-SEMANTICS trainer (torch), for outcome-level parity.

VERDICT r2 item 1: the per-step f64 parity tests (tests/test_torch_parity.py)
pin semantics, but nothing pinned a full training OUTCOME. This driver
trains the modern-torch replica of the reference (_TorchStemGNN — a
clearly-labeled transcription of /root/reference/models/base_model.py,
single-sourced in tests/test_torch_parity.py) with the reference engine
semantics (handler.py:103-191):

- z_score stats from the train split only (handler.py:112-121),
- RMSProp(lr, eps=1e-8) (handler.py:126-127),
- ExponentialLR(gamma=decay_rate) stepped every exponential_decay_step
  epochs (handler.py:130,170-171),
- MSE loss over shuffled batch-32 windows (handler.py:136-140,157-166),
- per-epoch validation, best-by-val-MAE model selection (handler.py:172-187),
- final test eval with TRAIN-split stats + best model (handler.py:194-207),
- attention dropout p=0.5 active in training mode (base_model.py:103,161).

Metrics go through stemgnn_tpu.metrics.evaluate — the SAME parity-pinned
metric code both frameworks share — so the comparison isolates training
outcomes, not metric reimplementation skew.

Usage:
    python benchmarks/torch_ref.py --dataset ECG_data [--epoch 50] ...
Writes output/<dataset>/torch_ref/result.json with test MAE/RMSE/MAPE.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import torch
import torch.nn as nn

from stemgnn_tpu.config import StemGNNConfig
from stemgnn_tpu.data.pipeline import compute_norm_stats, de_normalized, normalized
from stemgnn_tpu.data.synthetic import ensure_dataset
from stemgnn_tpu.metrics import evaluate

# the transcribed reference replica (torch>=1.8 fft shim; cited per method)
from tests.test_torch_parity import _TorchStemGNN


def make_windows(data: np.ndarray, w: int, h: int):
    """ForecastDataset index semantics (forecast_dataloader.py:68-73):
    hi in [w, T-h], x = data[hi-w:hi], y = data[hi:hi+h]."""
    his = np.arange(w, len(data) - h + 1)
    return his


def batch_xy(data, his, w, h):
    x = np.stack([data[hi - w : hi] for hi in his])
    y = np.stack([data[hi : hi + h] for hi in his])
    return (
        torch.from_numpy(x.astype(np.float32)),
        torch.from_numpy(y.astype(np.float32)),
    )


def run_eval(model, data, his, w, h, batch_size):
    model.eval()
    outs, ys = [], []
    with torch.no_grad():
        for lo in range(0, len(his), batch_size):
            x, y = batch_xy(data, his[lo : lo + batch_size], w, h)
            f, _ = model(x)
            outs.append(f.numpy())
            ys.append(y.numpy())
    return (
        np.concatenate(outs).astype(np.float64),
        np.concatenate(ys).astype(np.float64),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, default="ECG_data")
    ap.add_argument("--window_size", type=int, default=12)
    ap.add_argument("--horizon", type=int, default=3)
    ap.add_argument("--epoch", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--multi_layer", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--exponential_decay_step", type=int, default=5)
    ap.add_argument("--decay_rate", type=float, default=0.5)
    ap.add_argument("--validate_freq", type=int, default=1)
    ap.add_argument("--dropout_rate", type=float, default=0.5)
    ap.add_argument("--leakyrelu_rate", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data_dir", type=str, default=os.path.join(REPO, "dataset"))
    ap.add_argument("--output_dir", type=str, default=os.path.join(REPO, "output"))
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()

    if args.threads:
        torch.set_num_threads(args.threads)
    torch.manual_seed(args.seed)  # main.py:52

    # CSV ingest + 7/2/1 split by row-count truncation (main.py:42-50);
    # header row consumed like pd.read_csv default (data/pipeline.py quirk)
    import pandas as pd

    path = ensure_dataset(args.dataset, args.data_dir)
    data = pd.read_csv(path).values
    train_ratio = 7 / 10
    valid_ratio = 2 / 10
    train_data = data[: int(train_ratio * len(data))]
    valid_data = data[
        int(train_ratio * len(data)) : int((train_ratio + valid_ratio) * len(data))
    ]
    test_data = data[int((train_ratio + valid_ratio) * len(data)) :]

    w, h = args.window_size, args.horizon
    n = data.shape[1]
    stats = compute_norm_stats(train_data, "z_score")
    train_norm, _ = normalized(train_data, "z_score", stats)
    valid_norm, _ = normalized(valid_data, "z_score", stats)
    test_norm, _ = normalized(test_data, "z_score", stats)

    cfg = StemGNNConfig(
        units=n, window_size=w, horizon=h, multi_layer=args.multi_layer,
        dropout_rate=args.dropout_rate, leaky_rate=args.leakyrelu_rate,
    )
    model = _TorchStemGNN(cfg)
    # training-mode dropout on attention rows (base_model.py:103,161) — the
    # test replica omits the module (rate 0 there); apply it here. The
    # dropout MUST be a registered submodule so model.train()/model.eval()
    # toggle it exactly like the reference's self.dropout
    # (base_model.py:103): a free-standing closure module stays in training
    # mode during run_eval and corrupts best-by-val-MAE selection and the
    # final test metrics (advisor r3 high finding — fixed round 4; all
    # torch-side rows in parity_runs.json regenerated after the fix).
    model.att_dropout = nn.Dropout(args.dropout_rate)

    orig_attention = model.self_graph_attention

    def attention_with_dropout(enc):
        return model.att_dropout(orig_attention(enc))

    model.self_graph_attention = attention_with_dropout

    opt = torch.optim.RMSprop(model.parameters(), lr=args.lr, eps=1e-8)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=args.decay_rate)
    loss_fn = nn.MSELoss()

    train_his = make_windows(train_norm, w, h)
    valid_his = make_windows(valid_norm, w, h)
    test_his = make_windows(test_norm, w, h)
    print(f"{args.dataset}: N={n} train={len(train_his)} valid={len(valid_his)} "
          f"test={len(test_his)} windows; "
          f"params={sum(p.numel() for p in model.parameters() if p.requires_grad)}")

    out_dir = os.path.join(args.output_dir, args.dataset, "torch_ref")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    best_mae, best_state = np.inf, None
    for epoch in range(args.epoch):
        model.train()
        t0 = time.time()
        order = rng.permutation(len(train_his))
        total_loss, cnt = 0.0, 0
        for lo in range(0, len(order), args.batch_size):
            his = train_his[order[lo : lo + args.batch_size]]
            x, y = batch_xy(train_norm, his, w, h)
            model.zero_grad()
            f, _ = model(x)
            loss = loss_fn(f, y)
            loss.backward()
            opt.step()
            total_loss += float(loss)
            cnt += 1
        if (epoch + 1) % args.exponential_decay_step == 0:
            sched.step()  # handler.py:170-171
        print(f"| end of epoch {epoch:3d} | time: {time.time()-t0:5.2f}s "
              f"| train_total_loss {total_loss/cnt:5.4f}", flush=True)
        if (epoch + 1) % args.validate_freq == 0:
            fc_norm, tg_norm = run_eval(model, valid_norm, valid_his, w, h,
                                        args.batch_size)
            fc = de_normalized(fc_norm, "z_score", stats)
            tg = de_normalized(tg_norm, "z_score", stats)
            mape, mae, rmse = evaluate(tg, fc)
            print(f"VALIDATE: MAPE {mape:.6f} MAE {mae:.6f} RMSE {rmse:.6f}",
                  flush=True)
            if mae < best_mae:
                best_mae = mae
                best_state = {k: v.detach().clone()
                              for k, v in model.state_dict().items()}

    if best_state is not None:
        model.load_state_dict(best_state)  # best-by-val-MAE (handler.py:197)
    fc_norm, tg_norm = run_eval(model, test_norm, test_his, w, h, args.batch_size)
    fc = de_normalized(fc_norm, "z_score", stats)
    tg = de_normalized(tg_norm, "z_score", stats)
    mape, mae, rmse = evaluate(tg, fc)
    print(f"Performance on test set: MAPE: {mape:5.2f} | MAE: {mae:5.2f} "
          f"| RMSE: {rmse:5.4f}")
    result = {
        "framework": "torch_reference_replica",
        "dataset": args.dataset,
        "config": vars(args),
        "test_mae": float(mae),
        "test_rmse": float(rmse),
        "test_mape": float(mape),
        "best_val_mae": float(best_mae),
    }
    with open(os.path.join(out_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    # seed-suffixed copy: successive seed runs share out_dir, and the
    # parity driver (parity_run.py) reads the result after the subprocess
    # returns — the suffix keeps every seed's artifact recoverable
    with open(os.path.join(out_dir, f"result_s{args.seed}.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
