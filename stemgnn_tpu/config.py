"""Configuration dataclasses for stemgnn_tpu.

The flag surface mirrors the reference CLI (main.py:9-30) — same names and
defaults — with the reference's argparse bugs fixed (its `type=bool` flags
treat the string "False" as truthy; we parse booleans properly) and
TPU-specific knobs added (mesh shape, kernel selection, dtype policy).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class StemGNNConfig:
    """Model hyperparameters (reference Model.__init__, base_model.py:79-104)."""

    units: int  # node count N; the reference hard-codes GRU hidden == N
    window_size: int = 12  # W, FFT/sequence length (main.py:13)
    horizon: int = 3  # forecast steps (main.py:14)
    multi_layer: int = 5  # channel multiplier m (main.py:20)
    stack_cnt: int = 2  # two residual stacks (handler.py:105)
    dropout_rate: float = 0.5  # on attention rows (base_model.py:103,161)
    leaky_rate: float = 0.2  # attention LeakyReLU slope (base_model.py:102)
    # stretch config (no reference counterpart): top-k sparse latent graph +
    # feature-space Chebyshev — O(N*k) instead of O(N^2)/O(N^3); see
    # ops/sparse.py. None = exact dense reference semantics.
    sparse_k: Optional[int] = None
    # stretch-config GRU deviation (requires sparse_k; documented in
    # PARITY.md): decouple the GRU hidden size from N (the reference's
    # hidden==N costs 3N^2 weights and N sequential steps of N^2 work =
    # O(N^3) — architecturally impossible at 100k nodes) and optionally
    # run the node sequence as independent segments of `gru_segment`
    # nodes (parallel across segments, sequential depth = segment length).
    gru_hidden: Optional[int] = None
    gru_segment: int = 0  # 0 = one full-length segment
    # dispatch the node-sharded sparse-graph path (parallel/sparse_shard)
    # even when the 'graph' mesh axis has size 1 (collectives degenerate
    # to no-ops). Default False (GSPMD handles the single-shard case);
    # used by the bench to compile+measure the shard_map path natively on
    # one TPU chip at stretch N (multi-chip hardware unavailable here).
    force_sparse_shard: bool = False
    # measured dispatch threshold (benchmarks/results.json, v5e): below
    # ~64 nodes the Pallas kernels' grid/padding overhead exceeds the
    # fusion win (COVID-19 N=25: jnp_bf16 28.8k vs pallas_bf16 25.0k
    # windows/s), so forward() silently drops use_pallas for tiny graphs.
    # 0 disables the fallback (tests pin kernel equivalence at small N).
    pallas_min_nodes: int = 64
    # lax.scan unroll factor for the node-axis GRU recurrence — the serial
    # chain is the flagship step's floor; unrolling trades compile time /
    # code size for less per-iteration loop overhead. 1 = plain scan.
    gru_unroll: int = 1
    # jax.checkpoint on the GRU scan step: recompute gates in the backward
    # instead of saving ~10 [N,B,N] residual stacks (~25 MB/step flagship).
    # Round-4 in-step A/B: tie-to-slight-loss at N=140 (1.225 vs 1.191 ms
    # median) — default off; for memory-bound large-N configs where the
    # residuals are the HBM high-water mark.
    gru_remat: bool = False
    # route the node-axis recurrence through the fused Pallas GRU kernel
    # (ops/pallas_gru.py, persistent VMEM hidden state + resident fused
    # [H,3H] weights) instead of the XLA lax.scan — only active when the
    # pallas path itself is on (use_pallas) and N <= pallas_gru MAX_UNITS.
    # Default ON since round 5: the in-step A/B (benchmarks/gru_ab.json)
    # measures 1.131-1.149 ms vs 1.196-1.25 for the scan at flagship
    # shapes (round 2's composed loss predated the folded-DFT spectral
    # kernel); False restores the scan.
    pallas_gru: bool = True
    # attention kernel dispatch under use_pallas: the fused SDDMM kernel's
    # standalone fwd at N=140 measures ~30% slower than the jnp twin
    # (roofline.json) but composed better in round 2's in-step A/B; this
    # knob lets the bench re-decide per config. False = jnp attention even
    # when the other Pallas kernels are on.
    pallas_attention: bool = True

    def __post_init__(self):
        if self.gru_hidden is not None and self.sparse_k is None:
            raise ValueError(
                "gru_hidden (the decoupled stretch GRU) requires sparse_k: "
                "the dense attention path depends on the reference's "
                "hidden==N shape pun (base_model.py:152)"
            )
        if self.gru_segment and self.gru_hidden is None:
            raise ValueError("gru_segment requires gru_hidden")
        if self.gru_unroll < 1:
            raise ValueError(f"gru_unroll must be >= 1, got {self.gru_unroll}")
        if self.pallas_min_nodes < 0:
            raise ValueError(
                f"pallas_min_nodes must be >= 0, got {self.pallas_min_nodes}"
            )

    @property
    def wm(self) -> int:
        """Expanded spectral width W*m (base_model.py:24-25)."""
        return self.window_size * self.multi_layer

    @property
    def glu_in(self) -> int:
        """GLU stack input width 4*W (base_model.py:37)."""
        return 4 * self.window_size

    @property
    def glu_out(self) -> int:
        """GLU stack hidden width 4*W*m = W*output_channel (base_model.py:34,37)."""
        return 4 * self.window_size * self.multi_layer


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training/eval configuration (reference main.py flags + TPU additions)."""

    # --- reference flags, same names/defaults (main.py:9-30) ---
    train: bool = True
    evaluate: bool = True
    dataset: str = "ECG_data"
    window_size: int = 12
    horizon: int = 3
    train_length: float = 7.0
    valid_length: float = 2.0
    test_length: float = 1.0
    epoch: int = 50
    lr: float = 1e-4
    multi_layer: int = 5
    device: str = "tpu"  # reference default 'cpu'; here: jax platform hint
    validate_freq: int = 1
    batch_size: int = 32
    norm_method: str = "z_score"  # 'z_score' | 'min_max' | ''
    optimizer: str = "RMSProp"  # 'RMSProp' | anything-else => Adam (handler.py:126-129)
    early_stop: bool = False
    early_stop_step: int = 5  # referenced but undeclared in the reference (handler.py:189)
    exponential_decay_step: int = 5
    decay_rate: float = 0.5
    dropout_rate: float = 0.5
    leakyrelu_rate: float = 0.2
    # --- framework additions (no reference counterpart) ---
    seed: int = 0  # torch.manual_seed(0) at main.py:52
    # Which RNG stream draws the parameter init. 'torch' (default) = a
    # numpy replication of torch's CPU MT19937 stream in the reference's
    # exact Model.__init__ draw order (models/initializers.py
    # torch_stream_init; bit-exact for uniforms, <=2 ulp for the one
    # xavier_normal tensor) — with seed 0 this IS the draw the
    # reference's hardcoded torch.manual_seed(0) produces. 'threefry' =
    # jax.random threefry draws (distribution-faithful, different
    # stream). Default is 'torch' because the round-4 variance bisect
    # measured threefry draws landing in a ~2.5%-worse ECG loss basin
    # ~7/14 times vs ~1/14 for the torch stream
    # (benchmarks/variance_bisect.json; PARITY.md).
    init_stream: str = "torch"
    # -1 = dropout stream derives from `seed` (default). >=0 decouples the
    # per-epoch dropout key root from init/shuffle — the variance-bisect
    # knob (PARITY.md "known asymmetry"): rerunning a seed with a
    # different dropout_seed isolates how much of the seed-to-seed MAE
    # spread the dropout bitstream alone explains. (Measured round 4:
    # almost none — high seeds stayed high under fresh dropout streams.)
    dropout_seed: int = -1
    # -1 = per-epoch batch shuffle derives from `seed` (default). >=0
    # decouples the shuffle stream the same way (second bisect arm: with
    # dropout ruled out, this separates shuffle order from param init).
    shuffle_seed: int = -1
    use_pallas: bool = False  # route hot ops through Pallas kernels
    data_axis: int = 1  # mesh size along 'data' (DP)
    graph_axis: int = 1  # mesh size along 'graph' (node-block partition)
    use_ring: bool = False  # explicit ppermute ring attention over 'graph'
    param_dtype: str = "float32"  # parameter storage dtype (cast after init)
    compute_dtype: str = "float32"  # 'bfloat16' for MXU-native speed
    resume: bool = False  # restore params+opt state+epoch from last checkpoint
    ckpt_every: int = 1  # per-epoch checkpoint cadence (reference: every epoch)
    ckpt_async: bool = True  # overlap checkpoint transfer/write with training
    sparse_k: int = 0  # >0: top-k sparse latent graph (large-N stretch path)
    gru_hidden: int = 0  # >0: decoupled GRU hidden size (stretch; needs sparse_k)
    gru_segment: int = 0  # >0: segmented node recurrence (stretch; needs gru_hidden)
    pallas_min_nodes: int = 64  # below this N, --use_pallas falls back to jnp
    gru_unroll: int = 1  # lax.scan unroll for the node-axis GRU recurrence
    gru_remat: bool = False  # checkpoint the GRU scan step (memory-bound configs)
    log_jsonl: bool = True  # structured per-epoch metrics JSONL
    profile: bool = False  # dump a jax.profiler trace of one epoch
    debug_nans: bool = False  # sanitizer mode: raise on NaN/Inf in any op
    data_dir: str = "dataset"
    output_dir: str = "output"

    def model_config(self, node_cnt: int) -> StemGNNConfig:
        return StemGNNConfig(
            units=node_cnt,
            window_size=self.window_size,
            horizon=self.horizon,
            multi_layer=self.multi_layer,
            stack_cnt=2,
            dropout_rate=self.dropout_rate,
            leaky_rate=self.leakyrelu_rate,
            sparse_k=self.sparse_k if self.sparse_k > 0 else None,
            gru_hidden=self.gru_hidden if self.gru_hidden > 0 else None,
            gru_segment=self.gru_segment,
            pallas_min_nodes=self.pallas_min_nodes,
            gru_unroll=self.gru_unroll,
            gru_remat=self.gru_remat,
        )


def _str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "1"):
        return True
    if v.lower() in ("no", "false", "f", "0"):
        return False
    raise ValueError(f"not a boolean: {v!r}")


def add_cli_args(parser) -> None:
    """Register the reference's 21 flags (fixed bool parsing) + TPU flags."""
    defaults = TrainConfig()
    for field in dataclasses.fields(TrainConfig):
        name = f"--{field.name}"
        default = getattr(defaults, field.name)
        if field.type in ("bool", bool):
            parser.add_argument(name, type=_str2bool, default=default)
        else:
            parser.add_argument(name, type=type(default), default=default)


def config_from_args(args) -> TrainConfig:
    kwargs = {f.name: getattr(args, f.name) for f in dataclasses.fields(TrainConfig)}
    return TrainConfig(**kwargs)
