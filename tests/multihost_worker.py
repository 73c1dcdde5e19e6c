"""Worker process for the 2-process multi-host fixture (ROADMAP item 5).

The reference is strictly single-process (SURVEY.md §5: no distributed
backend). Our multi-host story is `jax.distributed.initialize` + a global
('data','graph') mesh (parallel/mesh.py docstring); this worker exercises
that exact path on CPU: 2 processes x 4 local virtual devices = the same
8-device mesh the in-process tests use, with gloo cross-process
collectives standing in for ICI/DCN.

Run (from tests/test_multihost.py):
    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python tests/multihost_worker.py <process_id> <port>

Prints `RESULT <process_id> <loss>` — the train-step loss after one global
SPMD step, which the test compares across processes and against a
single-process golden.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend init


def run_step(mesh):
    """One sharded train step on deterministic inputs; returns float loss.

    Shared by the 2-process workers and the single-process golden — the
    multi-host contract is that this function computes the SAME number
    regardless of how the 8 devices are spread across processes.
    """
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stemgnn_tpu.config import StemGNNConfig
    from stemgnn_tpu.models import stemgnn
    from stemgnn_tpu.parallel.mesh import DATA_AXIS
    from stemgnn_tpu.parallel.train import make_sharded_train_step
    from stemgnn_tpu.train.optim import make_optimizer

    def globalize(host, spec):
        """Host array (identical on every process) -> global jax.Array."""
        host = np.asarray(host)
        return jax.make_array_from_callback(
            host.shape, NamedSharding(mesh, spec), lambda idx: host[idx]
        )

    cfg = StemGNNConfig(units=8, window_size=8, horizon=3, multi_layer=2)
    params = stemgnn.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer("RMSProp", 1e-3)
    opt_state = opt.init(params)
    # every process computes identical init values (same PRNGKey on the
    # same-seeded algorithm); globalize replicates them onto the mesh
    params = jax.tree.map(lambda a: globalize(a, P()), params)
    opt_state = jax.tree.map(
        lambda a: globalize(a, P()) if hasattr(a, "shape") else a, opt_state
    )

    rng = np.random.default_rng(7)
    data = globalize(rng.standard_normal((128, 8)).astype(np.float32), P())
    hi = globalize(
        rng.integers(8, 128 - 3, size=16).astype(np.int32), P(DATA_AXIS)
    )
    step = make_sharded_train_step(cfg, opt, mesh)
    _, _, loss = step(params, opt_state, data, hi, jax.random.PRNGKey(1))
    return float(loss)


def engine_config():
    """Shared tiny config for the engine-path multihost fixture."""
    from stemgnn_tpu.config import TrainConfig

    return TrainConfig(
        window_size=8, horizon=3, epoch=2, batch_size=8, multi_layer=2,
        validate_freq=1, early_stop=False, data_axis=2, graph_axis=4,
        ckpt_async=False, log_jsonl=False,
    )


def engine_data():
    import numpy as np

    rng = np.random.default_rng(3)
    series = rng.standard_normal((160, 8)).astype(np.float32).cumsum(axis=0)
    return series[:112], series[112:144]


def run_engine(result_dir, epoch=None, resume=False):
    """The PRODUCTION engine path (engine.train) on whatever mesh the
    process topology provides — exercises make_globalizer + lead-gated I/O
    when jax.process_count() > 1, the plain path otherwise."""
    import dataclasses

    from stemgnn_tpu.train import engine

    cfg = engine_config()
    if epoch is not None:
        cfg = dataclasses.replace(cfg, epoch=epoch, resume=resume)
    train_data, valid_data = engine_data()
    metrics, _ = engine.train(train_data, valid_data, cfg, result_dir)
    return metrics["mae"], metrics["rmse"]


def run_stretch(mesh, n_nodes=102400):
    """The 100k-node stretch config on a MULTI-HOST mesh (ROADMAP item 3):
    sparse top-k latent graph + hidden-decoupled segmented GRU, graph axis
    = all 8 devices across both processes. One sharded train step; the
    loss must be finite and identical on every process (one SPMD program).

    This is the BASELINE.md north-star scale: the reference's hidden==N
    GRU is O(N^3) and cannot reach it; the documented deviation
    (PARITY.md) makes the step linear in N."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stemgnn_tpu.config import StemGNNConfig
    from stemgnn_tpu.models import stemgnn
    from stemgnn_tpu.train import engine
    from stemgnn_tpu.train.optim import make_optimizer

    def globalize(host, spec):
        host = np.asarray(host)
        return jax.make_array_from_callback(
            host.shape, NamedSharding(mesh, spec), lambda idx: host[idx]
        )

    cfg = StemGNNConfig(units=n_nodes, window_size=12, horizon=3,
                        multi_layer=2, sparse_k=32, gru_hidden=64,
                        gru_segment=1024)
    params = stemgnn.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer("RMSProp", 1e-4)
    opt_state = opt.init(params)
    params = jax.tree.map(lambda a: globalize(a, P()), params)
    opt_state = jax.tree.map(
        lambda a: globalize(a, P()) if hasattr(a, "shape") else a, opt_state
    )
    rng = np.random.default_rng(9)
    data = globalize(
        rng.standard_normal((64, n_nodes)).astype(np.float32), P()
    )
    hi = globalize(rng.integers(12, 61, size=2).astype(np.int32), P())
    step = engine.make_train_step(cfg, opt, False, "float32", mesh=mesh,
                                  shard_batch=False)
    _, _, loss = step(params, opt_state, data, hi, jax.random.PRNGKey(5))
    return float(loss)


def main():
    import numpy as np
    from jax.sharding import Mesh

    process_id, port = int(sys.argv[1]), sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "step"
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4
    if mode == "engine":
        mae, rmse = run_engine(sys.argv[4])
        print(f"RESULT {process_id} {mae:.10f} {rmse:.10f}", flush=True)
        return
    if mode == "engine_resume":
        # argv: ... engine_resume <result_dir> <epoch> <resume 0|1>
        mae, rmse = run_engine(
            sys.argv[4], epoch=int(sys.argv[5]), resume=sys.argv[6] == "1"
        )
        print(f"RESULT {process_id} {mae:.10f} {rmse:.10f}", flush=True)
        return
    if mode == "stretch":
        # graph axis spans all 8 devices across both processes
        mesh = Mesh(np.array(jax.devices()).reshape(1, 8), ("data", "graph"))
        loss = run_stretch(mesh)
        print(f"RESULT {process_id} {loss:.10f}", flush=True)
        return
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "graph"))
    loss = run_step(mesh)
    print(f"RESULT {process_id} {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
