"""stemgnn_tpu — a TPU-native spectral-temporal GNN forecasting framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
microsoft/StemGNN (reference mounted read-only at /root/reference):

- learned latent correlation graph (GRU encoder over the node axis +
  rank-1 additive self-attention -> symmetrized adjacency -> normalized
  Laplacian -> nonstandard Chebyshev basis with T0 = 0),
- spectral graph convolution (Chebyshev-Laplacian batched matmul),
- spectral-sequential cell (FFT along the window axis -> 3 GLU layers on
  real/imag parts -> inverse FFT),
- forecast/backcast residual stacking, trained with MSE + RMSProp and
  evaluated with the reference's MAPE/MAE/RMSE semantics.

The compute path is pure-functional JAX compiled with `jit`; the hot ops
have Pallas TPU kernels (`stemgnn_tpu.ops`) with `jnp` reference twins;
multi-chip scaling lives in `stemgnn_tpu.parallel` (mesh + shard_map,
data parallelism on the batch axis and node-block graph partitioning on
the 'graph' axis).

Numerical semantics follow the reference code exactly, including its
quirks (see SURVEY.md section 2); reference citations in docstrings use
the form `<file>:<line>` relative to /root/reference.
"""

__version__ = "0.1.0"

from stemgnn_tpu.config import StemGNNConfig, TrainConfig  # noqa: F401
from stemgnn_tpu.models.stemgnn import StemGNN  # noqa: F401
