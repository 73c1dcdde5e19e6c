"""Hot-path ops: `jnp` reference implementations + Pallas TPU kernels.

Dispatch contract: every op takes `use_pallas` (a static bool under jit).
The Pallas kernels are bit-compatible with the jnp twins up to float
reassociation; equivalence is enforced by tests/test_pallas_kernels.py.
"""

from __future__ import annotations

from stemgnn_tpu.ops.jnp_impl import (  # noqa: F401
    attention_adjacency,
    cheb_graph_conv,
    cheb_polynomial,
    dense,
    glu,
    laplacian_from_attention,
    order_contract,
    spe_seq_cell,
)


def select_spe_seq_cell(use_pallas: bool):
    if use_pallas:
        from stemgnn_tpu.ops.pallas_spectral import spe_seq_cell_pallas

        return spe_seq_cell_pallas
    return spe_seq_cell


def select_graph_conv(use_pallas: bool):
    if use_pallas:
        from stemgnn_tpu.ops.pallas_graph import cheb_graph_conv_pallas

        return cheb_graph_conv_pallas
    return cheb_graph_conv


def select_attention(use_pallas: bool):
    if use_pallas:
        from stemgnn_tpu.ops.pallas_attention import attention_adjacency_pallas

        return attention_adjacency_pallas
    return attention_adjacency
