"""One-off TPU experiment: GRU scan unroll sweep on the flagship config."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_log_compiles", True)
from bench import measure

for unroll in (1, 4):
    t0 = time.time()
    print(f"# compiling/measuring unroll={unroll} ...", file=sys.stderr, flush=True)
    r = measure(steps=96, use_pallas=True, precision="bfloat16",
                gru_unroll=unroll)
    print(json.dumps({"unroll": unroll,
                      "step_ms": round(r["step_time_ms"], 3),
                      "windows_per_s": round(r["windows_per_s"]),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
