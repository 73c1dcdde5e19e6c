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


def main():
    import numpy as np
    from jax.sharding import Mesh

    process_id, port = int(sys.argv[1]), sys.argv[2]
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "graph"))
    loss = run_step(mesh)
    print(f"RESULT {process_id} {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
