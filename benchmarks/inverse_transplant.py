"""Inverse transplant: train the TORCH replica from a JAX-drawn init.

Closes the symmetry loop of the seed-variance investigation (PARITY.md):
forward transplants showed torch-drawn inits reproduce their outcome
band inside OUR engine; this script loads a jax-stream init (e.g. the
known bad-basin draws, seeds 1/2) into `_TorchStemGNN` and trains with
the reference engine semantics. If the torch trainer ALSO plateaus at
~1.04 from a bad draw, the basin is confirmed to be a pure
loss-landscape property and the two engines are exchangeable.

Writes results into benchmarks/variance_bisect.json with
init="jax_inverse_transplant".

Usage: python benchmarks/inverse_transplant.py [--seeds 1,2] [--epoch 30]
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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "variance_bisect.json")


def load_jax_init_into_torch(model, params):
    """Inverse of tests.test_torch_parity.params_from_torch: copy a jax
    pytree init into the replica (linears transpose back to [out, in])."""
    import jax

    def t(a):
        return torch.from_numpy(np.asarray(a))

    with torch.no_grad():
        model.weight_key.copy_(t(params["weight_key"]))
        model.weight_query.copy_(t(params["weight_query"]))
        model.gru.weight_ih_l0.copy_(t(params["gru"]["w_ih"]))
        model.gru.weight_hh_l0.copy_(t(params["gru"]["w_hh"]))
        model.gru.bias_ih_l0.copy_(t(params["gru"]["b_ih"]))
        model.gru.bias_hh_l0.copy_(t(params["gru"]["b_hh"]))
        for blk, bp in zip(model.blocks, params["blocks"]):
            blk.weight.copy_(t(bp["weight"]).reshape(blk.weight.shape))
            for name in ("forecast", "forecast_result", "backcast_short_cut"):
                getattr(blk, name).weight.copy_(t(bp[name]["w"]).T)
                getattr(blk, name).bias.copy_(t(bp[name]["b"]))
            if blk.stack_i == 0:
                blk.backcast.weight.copy_(t(bp["backcast"]["w"]).T)
                blk.backcast.bias.copy_(t(bp["backcast"]["b"]))
            for g, gp in zip(blk.glus, bp["glu"]):
                g.left.weight.copy_(t(gp["left"]["w"]).T)
                g.left.bias.copy_(t(gp["left"]["b"]))
                g.right.weight.copy_(t(gp["right"]["w"]).T)
                g.right.bias.copy_(t(gp["right"]["b"]))
        # output head (round-4 advisor: omitting fc1/fc2 left a torch-drawn
        # head inside the "jax init" — a contaminated transplant)
        for name in ("fc1", "fc2"):
            getattr(model, name).weight.copy_(t(params[name]["w"]).T)
            getattr(model, name).bias.copy_(t(params[name]["b"]))
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="1,2")
    ap.add_argument("--epoch", type=int, default=30)
    ap.add_argument("--dataset", default="ECG_data")
    ap.add_argument("--threads", type=int, default=2)
    args = ap.parse_args()

    torch.set_num_threads(args.threads)

    import jax

    jax.config.update("jax_platforms", "cpu")  # init drawing only

    import pandas as pd

    from stemgnn_tpu.config import StemGNNConfig, TrainConfig
    from stemgnn_tpu.data.pipeline import (compute_norm_stats, de_normalized,
                                           normalized)
    from stemgnn_tpu.data.synthetic import ensure_dataset
    from stemgnn_tpu.metrics import evaluate
    from stemgnn_tpu.models import stemgnn
    from benchmarks.torch_ref import batch_xy, make_windows, run_eval
    from tests.test_torch_parity import _TorchStemGNN

    path = ensure_dataset(args.dataset, os.path.join(REPO, "dataset"))
    data = pd.read_csv(path).values
    train_data = data[: int(0.7 * len(data))]
    valid_data = data[int(0.7 * len(data)) : int(0.9 * len(data))]
    test_data = data[int(0.9 * len(data)) :]
    n = data.shape[1]
    stats = compute_norm_stats(train_data, "z_score")
    train_norm, _ = normalized(train_data, "z_score", stats)
    valid_norm, _ = normalized(valid_data, "z_score", stats)
    test_norm, _ = normalized(test_data, "z_score", stats)
    w, h = 12, 3
    cfg = StemGNNConfig(units=n, window_size=w, horizon=h, multi_layer=5,
                        dropout_rate=0.5)

    blob = {"runs": []}
    if os.path.exists(OUT):
        with open(OUT) as f:
            blob = json.load(f)

    for seed in (int(v) for v in args.seeds.split(",")):
        torch.manual_seed(seed)
        model = _TorchStemGNN(cfg)
        jparams = stemgnn.init_params(jax.random.PRNGKey(seed), cfg)
        load_jax_init_into_torch(model, jparams)
        # training-mode attention dropout, registered so eval disables it
        model.att_dropout = nn.Dropout(0.5)
        orig_att = model.self_graph_attention
        model.self_graph_attention = lambda enc: model.att_dropout(orig_att(enc))

        opt = torch.optim.RMSprop(model.parameters(), lr=1e-4, eps=1e-8)
        sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.5)
        loss_fn = nn.MSELoss()
        train_his = make_windows(train_norm, w, h)
        valid_his = make_windows(valid_norm, w, h)
        test_his = make_windows(test_norm, w, h)
        rng = np.random.default_rng(seed)
        best_mae, best_state = np.inf, None
        t0 = time.time()
        for epoch in range(args.epoch):
            model.train()
            order = rng.permutation(len(train_his))
            for lo in range(0, len(order), 32):
                his = train_his[order[lo : lo + 32]]
                x, y = batch_xy(train_norm, his, w, h)
                model.zero_grad()
                f, _ = model(x)
                loss_fn(f, y).backward()
                opt.step()
            if (epoch + 1) % 5 == 0:
                sched.step()
            fc_n, tg_n = run_eval(model, valid_norm, valid_his, w, h, 32)
            _, mae, _ = evaluate(de_normalized(tg_n, "z_score", stats),
                                 de_normalized(fc_n, "z_score", stats))
            print(f"seed {seed} epoch {epoch} val MAE {mae:.4f}", flush=True)
            if mae < best_mae:
                best_mae = mae
                best_state = {k: v.detach().clone()
                              for k, v in model.state_dict().items()}
        if best_state is not None:
            model.load_state_dict(best_state)
        fc_n, tg_n = run_eval(model, test_norm, test_his, w, h, 32)
        mape, mae, rmse = evaluate(de_normalized(tg_n, "z_score", stats),
                                   de_normalized(fc_n, "z_score", stats))
        res = {
            "dataset": args.dataset, "seed": seed,
            "init": "jax_inverse_transplant", "engine": "torch",
            "epochs": args.epoch, "test_mae": float(mae),
            "test_rmse": float(rmse), "wall_s": round(time.time() - t0, 1),
        }
        blob["runs"] = [r for r in blob["runs"]
                        if not (r.get("init") == "jax_inverse_transplant"
                                and r["seed"] == seed)]
        blob["runs"].append(res)
        with open(OUT, "w") as f:
            json.dump(blob, f, indent=2)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
