"""CLI entry point — mirrors the reference's main.py flag surface and flow.

Usage (same as the reference, README.md:41-57):
    python main.py --dataset ECG_data --window_size 12 --horizon 3 ...

Differences from the reference CLI (all deliberate; SURVEY.md section 5):
- boolean flags parse properly (`--train False` works; reference bug at
  main.py:10-11),
- `--early_stop_step` exists (referenced-but-undeclared in the reference,
  handler.py:189),
- missing dataset CSVs are synthesized deterministically (the reference's
  bundled CSVs are stripped from this mount),
- TPU flags: --use_pallas, --data_axis/--graph_axis mesh sizes, dtypes,
  --resume, --seed.
"""

import argparse
import os
from datetime import datetime

from stemgnn_tpu.config import add_cli_args, config_from_args
from stemgnn_tpu.data import ensure_dataset, load_csv, split_by_ratio
from stemgnn_tpu.train.engine import test, train

parser = argparse.ArgumentParser()
add_cli_args(parser)
args = parser.parse_args()
cfg = config_from_args(args)
print(f"Training configs: {cfg}")

import jax

if cfg.device == "cpu":
    # reference default is cpu (main.py:21); the image force-registers the
    # TPU platform, so honoring --device cpu needs an explicit override
    jax.config.update("jax_platforms", "cpu")

if cfg.debug_nans:
    # sanitizer mode (SURVEY.md section 5: the JAX analogue of a runtime
    # race/NaN sanitizer): every op output is checked, first NaN raises
    # with the offending primitive
    jax.config.update("jax_debug_nans", True)

if os.environ.get("JAX_COORDINATOR_ADDRESS"):
    # multi-host SPMD (SURVEY.md section 5 "distributed backend"): every
    # process runs this same program; the ('data','graph') mesh built by
    # the engine then spans all hosts' devices (ICI intra-slice, DCN
    # across slices). Single-host runs never enter this branch.
    jax.distributed.initialize(
        coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]),
    )

data_file = ensure_dataset(cfg.dataset, cfg.data_dir)
result_train_file = os.path.join(cfg.output_dir, cfg.dataset, "train")
result_test_file = os.path.join(cfg.output_dir, cfg.dataset, "test")
os.makedirs(result_train_file, exist_ok=True)
os.makedirs(result_test_file, exist_ok=True)
data = load_csv(data_file)

train_data, valid_data, test_data = split_by_ratio(
    data, cfg.train_length, cfg.valid_length, cfg.test_length
)

if __name__ == "__main__":
    if cfg.train:
        try:
            before_train = datetime.now().timestamp()
            _, normalize_statistic = train(train_data, valid_data, cfg, result_train_file)
            after_train = datetime.now().timestamp()
            print(f"Training took {(after_train - before_train) / 60} minutes")
        except KeyboardInterrupt:
            print("-" * 99)
            print("Exiting from training early")
    if cfg.evaluate:
        before_evaluation = datetime.now().timestamp()
        test(test_data, cfg, result_train_file, result_test_file)
        after_evaluation = datetime.now().timestamp()
        print(f"Evaluation took {(after_evaluation - before_evaluation) / 60} minutes")
    print("done")
