"""Hot-path ops: `jnp` reference implementations + Pallas TPU kernels.

Dispatch contract: every op takes `use_pallas` (a static bool under jit).
The Pallas kernels are bit-compatible with the jnp twins up to float
reassociation; equivalence is enforced by tests/test_pallas_kernels.py.
"""

from __future__ import annotations

from stemgnn_tpu.ops.jnp_impl import (  # noqa: F401
    attention_adjacency,
    attention_from_kq,
    cheb_graph_conv,
    cheb_polynomial,
    dense,
    glu,
    laplacian_from_attention,
    order_contract,
    spe_seq_cell,
)


def _compute_dtype(precision: str):
    import jax.numpy as jnp

    return jnp.bfloat16 if precision == "bfloat16" else jnp.float32


def select_spe_seq_cell(use_pallas: bool, precision: str = "float32"):
    if use_pallas:
        import functools

        from stemgnn_tpu.ops.pallas_spectral import spe_seq_cell_pallas

        return functools.partial(
            spe_seq_cell_pallas, compute_dtype=_compute_dtype(precision)
        )
    return spe_seq_cell


def select_graph_conv(use_pallas: bool, precision: str = "float32"):
    if use_pallas:
        import functools

        from stemgnn_tpu.ops.pallas_graph import cheb_graph_conv_pallas

        return functools.partial(
            cheb_graph_conv_pallas, compute_dtype=_compute_dtype(precision)
        )
    return cheb_graph_conv


def select_gru(use_pallas: bool, units: int, force_pallas_gru: bool = False,
               unroll: int = 1, remat: bool = False):
    """GRU recurrence dispatch. History: the round-2 standalone probe had
    the fused Pallas kernel tying lax.scan on fwd and losing on fwd+bwd,
    so the scan was the default through round 4. Round-5 re-measured
    IN-STEP after the spectral-kernel redesign (benchmarks/gru_ab.json):
    the kernel now wins composed (1.131-1.149 ms vs 1.196-1.25 at
    UNROLL=16, flagship pallas-bf16), so config.pallas_gru defaults True
    and the model passes force_pallas_gru when the pallas path is active
    (N <= MAX_UNITS guard below; scan twin above it and when off)."""
    if force_pallas_gru and units <= 512:
        from stemgnn_tpu.ops.pallas_gru import gru_over_nodes_pallas

        return gru_over_nodes_pallas
    from stemgnn_tpu.models.stemgnn import gru_over_nodes

    return lambda gru, x: gru_over_nodes(gru, x, unroll=unroll, remat=remat)


def select_attention(use_pallas: bool):
    if use_pallas:
        from stemgnn_tpu.ops.pallas_attention import attention_adjacency_pallas

        return attention_adjacency_pallas
    return attention_adjacency


def select_attention_kq(use_pallas: bool):
    """Attention from precomputed [B, N] key/query projections — the
    production dense path. The projections come from POST-SCAN matmuls on
    the GRU encoding (models/stemgnn.py); the in-scan kq fusion
    (gru_kq_over_nodes) was measured 45% slower composed and is a
    kept-but-rejected experiment (CLAUDE.md round-3 facts)."""
    if use_pallas:
        from stemgnn_tpu.ops.pallas_attention import attention_kq_pallas

        return attention_kq_pallas
    return attention_from_kq
