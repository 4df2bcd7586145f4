"""Configuration for word2bits_tpu.

Mirrors the reference CLI's 17 flags and their defaults
(reference src/word2bits.cpp:48-59 for defaults, :596-611 for the flag names),
as a validated dataclass.  The reference's `-threads` flag configured Hogwild
thread count; here it is kept for CLI compatibility but maps onto batch /
mesh configuration (Hogwild's racy shared-memory parallelism has no TPU
equivalent — the idiomatic formulation is a synchronous minibatched step).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class Word2BitsConfig:
    """Training configuration.

    Field names/defaults follow the reference flags
    (reference src/word2bits.cpp:48-59):
      -bitlevel 1 -size 100 -window 5 -negative 5 -alpha 0.05 -sample 1e-3
      -min-count 5 -threads 12 -iter 5 -reg 0 -binary 0 -debug 2
      -save-every-epoch 0 -classes 0
    """

    # --- file paths (reference -train/-output/-save-vocab/-read-vocab) ---
    train_file: Optional[str] = None
    output_file: Optional[str] = None
    save_vocab_file: Optional[str] = None
    read_vocab_file: Optional[str] = None

    # --- model ---
    bitlevel: int = 1          # quantization level; 0 = full precision
    size: int = 100            # embedding dimension (reference layer1_size)
    window: int = 5            # max context half-width
    negative: int = 5          # negative samples per center word
    alpha: float = 0.05        # starting learning rate
    sample: float = 1e-3       # frequent-word subsampling threshold
    min_count: int = 5         # prune words rarer than this from the vocab
    iter: int = 5              # epochs
    reg: float = 0.0           # L2 regularization on quantized params
    binary: bool = False       # output format: binary fp32 rows vs Glove text
    packed: bool = False       # extension: also write bit-packed vectors (.pack)
    debug: int = 2             # verbosity (2 = progress lines)
    save_every_epoch: bool = False
    classes: int = 0           # reference flag; nonzero produced empty output

    # --- TPU execution (replaces reference -threads semantics) ---
    threads: int = 12          # accepted for CLI compat; not a parallelism knob
    # Centers per synchronous step.  0 = auto: 256, the measured
    # quality-first default — smaller batches sit closer to the reference's
    # per-word Hogwild updates (less within-batch parameter staleness).
    # 5-seed sweeps on the structured parity corpus (per-center,
    # reference-default flags; tools/sweep_b4_lr.py):
    #   bitlevel 0: B=256 95.5±0.3  vs B=512 94.6  (reference 93.5±0.6)
    #   bitlevel 1: B=256 41.5±4.3  vs B=512 38.8  (reference 40.4±2.2)
    #   bitlevel 2: B=256 50.9±2.7  vs B=512 51.3  (reference 47.9±1.3)
    #   bitlevel 4: B=256 56.0±1.4  vs B=512 53.9  (reference 54.9±0.9)
    # At fine grids (>= 4) LR rescaling moves the WRONG way in both
    # directions (0.5x 49.0, 1.5x 47.1), so batch — not LR — is the right
    # knob there.  Throughput configs pass -batch-size explicitly (the
    # bench runs B=8192).
    batch_size: int = 0
    steps_per_chunk: int = 256 # steps fused into one jitted scan call
    # How a steps_per_chunk > 1 chunk iterates (fused-table CBOW path):
    # "scan" = lax.scan (default; XLA double-buffers the carried table, ~2x
    # peak HBM — fine to ~2M x 800d bf16); "fori" = lax.fori_loop, whose
    # while-loop carry stays IN PLACE (TPU memory_analysis: peak = 1x table
    # + temps at 3.7M x 800d), so huge-vocab configs amortize the per-step
    # dispatch latency that -steps-per-chunk 1 pays — pair with
    # -scatter-impl grmw for the flagship capacity path (measured 2.5M
    # words/sec vs round-4's 581k; tools/capacity_ablate.py).  "unroll"
    # traces the step S times (same aliasing; compile time grows with S).
    loop_mode: str = "scan"
    # Negative-sample sharing tile: 0 = per-center draws (exact reference
    # semantics); G > 0 shares each tile of G centers' negatives, turning the
    # score/gradient contractions into MXU matmuls (standard batched-word2vec
    # optimization, cf. pWord2Vec arXiv 1604.04661; documented divergence).
    neg_sharing: int = 0
    # Negative pools per tile (requires neg_sharing > 0): P > 1 draws P*K
    # negatives per tile and assigns center g to pool g % P, so each
    # negative set is shared by only G/P centers while the MXU contraction
    # keeps the full (G, D) x (D, P*K) tile shape.  Decouples the sharing
    # degree (quality knob — ACCEPTANCE.md shared-mode rows) from the tile
    # size (MXU-efficiency knob).  P == G reproduces per-center negative
    # semantics at shared-mode matmul shapes.
    neg_pool: int = 1
    # Interleave u/v into one (V, 2D) table: merges the u-position and
    # center-v scatters (same word ids) into one — ~15% faster, numerically
    # identical (models/cbow_fused.py). Requires neg_sharing > 0.
    fused_tables: bool = False
    # Model family. The reference trains only CBOW (SURVEY.md section 0);
    # skip-gram is an extension with the same quantization contract.
    model: str = "cbow"
    # Route the shared-negative score/gradient phase through the fused
    # Pallas kernel (kernels/score_pallas.py) instead of the XLA matmul
    # path.  Requires neg_sharing > 0.  Measured on the v5e at the bench
    # config — see ARCHITECTURE.md "Pallas score kernel" for the verdict;
    # off by default.
    use_pallas: bool = False
    # Route parameter scatters through ops.scatter.scatter_add_dedup with
    # this block size (0 = off): duplicate update rows are combined on the
    # MXU per block and each block is scattered with unique indices,
    # sidestepping XLA's serialized duplicate-safe row loop.  Same sums as
    # the baseline modulo float ordering.  Measured on the v5e — see
    # ARCHITECTURE.md scatter section for when it wins.
    dedup_block: int = 0
    # Hot/cold scatter split (0 = off): update rows for the hot_rows most
    # frequent words (the vocab is count-sorted) accumulate via a one-hot
    # MXU matmul + one dense slice update — no scatter — and the cold
    # remainder scatters compacted to its true per-step count using
    # positions precomputed once per epoch (data/pipeline.cold_positions).
    # Targets XLA's per-row serialized scatter loop, the step's measured
    # bottleneck (ARCHITECTURE.md ablation).  Fused-table CBOW single-chip
    # path with the host epoch pipeline only.
    hot_rows: int = 0
    # Stratified hot/cold negative sampling (with -hot-rows H): each pool of
    # K negatives draws a FIXED kh hot lanes (id < H) and K-kh cold, with
    # importance weights restoring the exact unigram^0.75 expectation
    # (sampling/unigram.build_stratified_tables).  Hot lanes join the dense
    # MXU accumulation; only the few cold lanes scatter.  Distribution-level
    # divergence from iid draws, documented in the sampler.
    neg_stratify: bool = False
    # Dense hot negatives (with -hot-rows H): the hot stratum of the
    # negative distribution is computed EXACTLY — every center scores
    # against all H frequent words with weight K*P(draw) via [B,H] MXU
    # contractions (Rao-Blackwellized NEG: same expected gradient, zero
    # sampling variance for ~90% of the negative mass, per-center exact).
    # Only the cold tail stays sampled.  See models/cbow_fused.py.
    neg_dense_hot: bool = False
    # Route the hot-row dense accumulation through the Pallas fused
    # one-hot kernel (kernels/hot_pallas.py): one-hot tiles generated in
    # VMEM instead of a [N, H] HBM operand.  Requires -hot-rows.
    hot_pallas: bool = False
    # In-place Pallas group-RMW parameter scatter (the CAPACITY path):
    # XLA:TPU copy-insertion never runs the table scatter in place — even
    # donated, every scatter formulation holds a full table-sized HLO temp
    # (measured 2026-08-19; kernels/scatter_pallas.py docstring), so the
    # 3.7M x 800d full-Wikipedia table OOMs one chip without this.  With
    # it, the update routes through a Pallas DMA read-modify-write kernel
    # whose input/output alias keeps peak HBM at 1x table: 3.7M x 800d
    # bf16 measured at 28.2 ms/step / 581k words/sec on one v5e
    # (tools/capacity_probe.py --rmw).  The table storage is padded to the
    # dtype's sublane group (16 rows bf16 / 8 f32) and to 128-lane rows;
    # exports slice the padding off.  Fused-table CBOW single-chip path;
    # use with -steps-per-chunk 1 for the donated no-scan loop.
    rmw_scatter: bool = False
    # Fused context+positive forward kernel (kernels/context_pallas.py):
    # quantize -> banded context sums -> center scores -> positive grads in
    # one VMEM pass per batch tile (the f32 q_slab never materializes).
    # Requires -banded-tile and reg == 0; fused-table CBOW, single chip.
    # Measured +2% on the shipped bench config (722 vs 737 us/step,
    # step_bench 2026-08-20); update-equal modulo float summation order.
    context_pallas: bool = False
    # Banded windowed sums (0 = off): compute the step's two windowed
    # reductions (context sums and per-position u sums) as banded-block MXU
    # matmuls with this tile size instead of 2W shifted VPU adds
    # (ops/windowed.py).  Same sums, different float order; CBOW slab/fused
    # and sharded paths (per-shard tiles on the mesh).  Measured against
    # the shift formulation by tools/step_bench.py before flipping any
    # default.
    banded_tile: int = 0
    # Parameter-scatter implementation: "add" = XLA scatter-add (serialized
    # at ~50 ns/emitted row on TPU); "span" = the spanning sweep kernel
    # (kernels/span_scatter.py) — rows sorted by id stream through the
    # table's windows with VMEM-resident accumulation and one-hot MXU
    # placement, and in the scan path the sort/plan pre-pass batch-hoists
    # out of the loop (negatives pre-drawn with each step's own key, so
    # updates are unchanged).  Update-equal modulo float summation order;
    # the bench throughput winner at the text8-like shape (span_banded256_
    # S128, BENCH r3).  CBOW paths: single-chip fused-table and slab
    # (including the per-center exact mode), and since round 4 the sharded
    # (data x vocab) mesh body (per-shard local ids, update lists
    # all-gathered over the data axis — parallel/sharded_slab.py); the
    # table storage is padded (rows to span_window, columns to the 128-lane
    # tile) and exports/checkpoints slice the padding off.
    # "grmw" = the sorted group-RMW kernel (kernels/group_rmw.py): sorted
    # compact rows open pipelined read-modify-write chains on their 16-row
    # (bf16; 8 f32) sublane groups with one-hot MXU placement in-kernel.
    # Update-equal modulo float order, peak HBM = 1x table like
    # -rmw-scatter, but without the XLA group-layout expansion + dedup
    # combine that cost the round-4 capacity path 21 ms/step — the
    # huge-vocab winner (3.7M x 800d bf16: 2.5M words/sec with -loop-mode
    # fori -banded-tile 256 vs 581k for rmw_scatter;
    # tools/capacity_ablate.py, v5e 2026-08-20).  Single-chip CBOW fused/
    # slab paths; storage pads rows to the sublane group and columns to
    # the 128-lane tile.
    scatter_impl: str = "add"
    # Sweep geometry (scatter_impl="span"): rows per table window per DMA
    # (VMEM accumulator is [2, span_window, cols]) and sorted-stream rows
    # per grid step ("grmw" reuses span_chunk as its row-chunk size).
    # Tune with tools/step_bench.py / bench.py variants.
    span_window: int = 512
    span_chunk: int = 128
    # Multi-chip dense-hot balance (-mesh-shape + -neg-dense-hot): place the
    # hot head interleaved across the vocab shards (parallel/layout.py) so
    # each shard runs its OWN [., H/nv] dense sub-range instead of every
    # shard redundantly repeating the full [., H] contraction (the count-
    # sorted hot head otherwise lives entirely on shard 0).  Numerically
    # identical; on by default, `-hot-interleave 0` keeps the contiguous
    # layout.
    hot_interleave: bool = True
    # Full train-state checkpointing (extension: the reference can only
    # export vectors per epoch, not resume — SURVEY.md section 5).
    checkpoint_dir: Optional[str] = None
    resume: bool = False
    # Checkpoint cadence: True (default) saves after every epoch; False
    # saves only after the run's final epoch.  At flagship scale every
    # checkpoint is a full-table device fetch (~12 GB through the tunnel),
    # so per-epoch checkpointing is a deliberate cost knob.
    checkpoint_every_epoch: bool = True
    # Corpora beyond this many encoded tokens stream through the device in
    # fixed segments per epoch (keeps token arrays bounded next to the
    # embedding tables in HBM).  268M tokens ~= 2 GB of epoch arrays.
    segment_tokens: int = 1 << 28
    # Build epoch arrays (subsample + compact + sentence ids) ON DEVICE
    # (data/device_pipeline.py): the encoded corpus uploads once and per-epoch
    # prep is a single jitted pass instead of a host numpy rebuild (the host
    # pass takes ~10s per 17M-token epoch — 5x+ the time the chip needs to
    # CONSUME the epoch at bench throughput, so the host pipeline is the
    # end-to-end bottleneck on TPU).  Applies to the single-segment,
    # single-chip path; streamed segments and the sharded trainer keep the
    # host pipeline.  Subsample draws come from threefry instead of the host
    # Generator (same distribution, different stream — C9-style divergence).
    # Default None = AUTO: on unless the config needs host-precomputed cold
    # positions (-hot-rows without -neg-dense-hot) or a mesh; pass 0/1 to
    # force.
    device_epoch: Optional[bool] = None
    seed: int = 1
    init: str = "reference"    # "reference" (exact LCG parity) or "uniform"
    # Batch-aware LR auto-scaling. `alpha` is specified in the reference's
    # per-example-Hogwild units (reference src/word2bits.cpp:48 default 0.05);
    # our synchronous minibatch step has a different optimum at bitlevel 2,
    # where quantization clamps update magnitudes and the summed in-batch
    # gradients need ~3x the per-example LR to move the full-precision store
    # across quantization bin boundaries at the reference's rate.  Measured
    # sweep (docs/acceptance_notes.md): bitlevel 2 accuracy 43.6 @ 1x ->
    # 50.2 @ 3x (>= reference 51.7-equivalent with bf16); bitlevel 1 is
    # LR-robust (38.3 @ 1x vs 37.3 @ 2x, defaults already ahead of the
    # reference); bitlevel 0 DIVERGES above 1x (nothing clamps fp32
    # magnitudes); and the factor is batch-size-insensitive over B=64..512.
    # At bitlevel 8 (round-5 sweep, tools/sweep_b4_lr.py --bitlevel 8
    # --seeds 5): 1.2x clears the reference mean (57.8±1.5 vs ref
    # 56.4±0.6) where 1.0x sat within-spread-below (55.5±1.5), 0.8x
    # regressed (52.4), 1.3x is at par (57.1±1.9) and 1.5x clearly worse
    # (52.7±1.9) — a peak at ~1.2x: the finest grid still clamps like
    # bitlevel 2, just with a smaller optimal factor; batch (128/192/256)
    # is no lever.
    # auto_lr=True applies the measured factor so reference-default flags
    # reach reference-parity accuracy; `-auto-lr 0` uses `alpha` verbatim.
    auto_lr: bool = True
    # Backing-store dtype for u/v. "bfloat16" halves HBM (the 3.7M x 800
    # tables fit one chip) at the cost of rounded update accumulation —
    # compute stays float32 either way; validate convergence before use.
    dtype: str = "float32"

    # jax.profiler trace output dir (traces the first training chunk);
    # the aux-subsystem analog of the reference's words/sec counter
    # (SURVEY.md section 5 tracing row). None = off.
    profile_dir: Optional[str] = None

    # --- sharding ---
    mesh_shape: Optional[dict] = None  # e.g. {"data": 2, "vocab": 4}; None = single chip

    def __post_init__(self):
        if self.batch_size == 0:
            # auto batch: see the field docs (measured quality-first default)
            object.__setattr__(self, "batch_size", 256)
        if self.bitlevel == 3:
            # The reference's quantize() has a hole at bitlevel 3: every input
            # maps to 0.0 (verified; reference src/word2bits.cpp:73-108 falls
            # through all branches with retval=0).  Training at bitlevel 3
            # therefore silently learns nothing.  We reject it up front; the
            # low-level quantize() op still reproduces the 0.0 behavior.
            raise ValueError(
                "bitlevel=3 is rejected: the reference quantizer maps every "
                "value to 0 at bitlevel 3 (a bug-hole in "
                "reference src/word2bits.cpp:73-108). Use 0, 1, 2, or >=4."
            )
        if self.bitlevel < 0:
            raise ValueError(f"bitlevel must be >= 0, got {self.bitlevel}")
        if self.size <= 0:
            raise ValueError(f"size must be positive, got {self.size}")
        if self.window <= 0:
            raise ValueError(f"window must be positive, got {self.window}")
        if self.negative < 0:
            raise ValueError(f"negative must be >= 0, got {self.negative}")
        if self.iter <= 0:
            raise ValueError(f"iter must be positive, got {self.iter}")
        if self.min_count < 0:
            raise ValueError(f"min_count must be >= 0, got {self.min_count}")
        if self.batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {self.batch_size}")
        if self.neg_sharing < 0 or (self.neg_sharing and
                                    self.batch_size % self.neg_sharing):
            raise ValueError(
                f"neg_sharing ({self.neg_sharing}) must be 0 or divide "
                f"batch_size ({self.batch_size})")
        if self.use_pallas and not self.neg_sharing:
            raise ValueError(
                "use_pallas requires neg_sharing > 0 (the kernel fuses the "
                "shared-negative tile phase; per-center mode has no tiles)")
        if self.neg_pool < 1:
            raise ValueError(f"neg_pool must be >= 1, got {self.neg_pool}")
        if self.neg_pool > 1:
            if not self.neg_sharing:
                raise ValueError("neg_pool > 1 requires neg_sharing > 0")
            if self.neg_sharing % self.neg_pool:
                raise ValueError(
                    f"neg_pool ({self.neg_pool}) must divide neg_sharing "
                    f"({self.neg_sharing}) so every pool serves the same "
                    "number of centers")
        if self.use_pallas and self.model != "cbow":
            raise ValueError("use_pallas is implemented for the cbow model")
        if self.hot_rows < 0:
            raise ValueError(f"hot_rows must be >= 0, got {self.hot_rows}")
        if self.banded_tile < 0:
            raise ValueError(
                f"banded_tile must be >= 0, got {self.banded_tile}")
        if self.banded_tile and self.model != "cbow":
            raise ValueError("banded_tile is implemented for the CBOW "
                             "slab/fused/sharded paths")
        if self.hot_pallas and not self.hot_rows:
            raise ValueError("hot_pallas requires -hot-rows H")
        if self.hot_pallas and self.mesh_shape:
            raise ValueError("hot_pallas is single-chip only (the sharded "
                             "path applies deltas shard-locally)")
        if self.hot_rows:
            if self.mesh_shape:
                # multi-chip: only the dense-hot negative path uses the hot
                # boundary (vocab-local exact negatives, no cold-position
                # precompute); the slab hot/cold scatter split is single-chip
                if not self.neg_dense_hot:
                    raise ValueError(
                        "with -mesh-shape, -hot-rows is only meaningful "
                        "together with -neg-dense-hot 1")
            elif self.model == "skipgram":
                # skip-gram has no slab hot/cold split; the hot boundary is
                # only the dense-hot negative stratum
                if not self.neg_dense_hot:
                    raise ValueError(
                        "with -model skipgram, -hot-rows is only "
                        "meaningful together with -neg-dense-hot 1")
            else:
                if not (self.fused_tables and self.neg_sharing
                        and self.model == "cbow"):
                    raise ValueError(
                        "hot_rows requires the fused-table CBOW path "
                        "(-fused-tables 1 -neg-sharing G -model cbow)")
                if self.device_epoch and not self.neg_dense_hot:
                    raise ValueError(
                        "the hot/cold slab scatter split uses host-"
                        "precomputed cold positions, incompatible with "
                        "-device-epoch 1 (with -neg-dense-hot 1 the hot "
                        "boundary applies to negatives only and composes "
                        "with -device-epoch; the slab split then stays off)")
        if self.neg_stratify or self.neg_dense_hot:
            which = "neg_stratify" if self.neg_stratify else "neg_dense_hot"
            if self.neg_stratify and self.neg_dense_hot:
                raise ValueError(
                    "neg_stratify and neg_dense_hot are exclusive "
                    "(dense-hot subsumes the stratified hot lanes)")
            if not self.hot_rows:
                raise ValueError(
                    f"{which} requires -hot-rows H (it exists to route "
                    "hot negatives through the dense accumulation)")
            if self.use_pallas:
                raise ValueError(
                    f"{which} is not threaded into the Pallas score "
                    "kernel; drop -use-pallas")
            if self.neg_dense_hot and self.bitlevel >= 4:
                # measured: dense-hot at bitlevel 4 scores 7+ points below
                # per-center sampling (48.5±0.9 vs 56.0±1.4, ACCEPTANCE.md)
                # — the exact hot expectation flattens the fine-grid
                # estimator's variance the quantizer needs (VERDICT r4
                # item 7); allowed, but never silently
                import warnings
                warnings.warn(
                    "-neg-dense-hot at -bitlevel >= 4 measured 7+ analogy "
                    "points BELOW sampled negatives at reference-default "
                    "shapes (ACCEPTANCE.md); verify quality on your corpus "
                    "or drop -neg-dense-hot at fine grids", stacklevel=2)
            if self.neg_stratify and self.model != "cbow":
                raise ValueError("neg_stratify is implemented for the "
                                 "fused-table CBOW path only")
            if self.neg_stratify and self.negative < 2:
                raise ValueError(
                    "neg_stratify needs -negative >= 2 so each nonzero "
                    "stratum gets a lane (sampling/unigram.lane_split)")
        if self.scatter_impl not in ("add", "span", "grmw"):
            raise ValueError(f"unknown -scatter-impl {self.scatter_impl!r} "
                             "(supported: add, span, grmw)")
        if self.scatter_impl == "grmw":
            if self.mesh_shape:
                raise ValueError(
                    "-scatter-impl grmw is single-chip (the capacity "
                    "path); the mesh composes with -scatter-impl span")
            if self.model != "cbow" or not (self.fused_tables
                                            and self.neg_sharing):
                raise ValueError(
                    "-scatter-impl grmw runs on the fused-table CBOW path "
                    "(-fused-tables 1 -neg-sharing G -model cbow)")
            if (self.rmw_scatter or self.dedup_block or self.hot_rows
                    or self.neg_stratify or self.neg_dense_hot
                    or self.use_pallas):
                raise ValueError(
                    "-scatter-impl grmw replaces the plain scatter; it "
                    "does not compose with rmw_scatter/dedup_block/"
                    "hot_rows/neg_stratify/neg_dense_hot/use_pallas")
            if self.span_chunk <= 0:
                raise ValueError("-span-chunk must be positive, "
                                 f"got {self.span_chunk}")
        if self.context_pallas:
            if self.mesh_shape:
                raise ValueError("-context-pallas is single-chip (the "
                                 "sharded bodies keep the XLA path)")
            if self.model != "cbow":
                raise ValueError(
                    "-context-pallas runs on the CBOW paths (fused-table "
                    "or slab, including the exact per-center mode)")
            if not self.banded_tile:
                raise ValueError("-context-pallas requires -banded-tile "
                                 "(the kernel consumes the banded masks)")
            if self.reg:
                raise ValueError("-context-pallas supports -reg 0 only "
                                 "(the XLA path keeps the reg terms)")
        if self.loop_mode not in ("scan", "fori", "unroll"):
            raise ValueError(f"unknown -loop-mode {self.loop_mode!r} "
                             "(supported: scan, fori, unroll)")
        if self.loop_mode != "scan":
            if self.mesh_shape:
                raise ValueError("-loop-mode applies to the single-chip "
                                 "fused CBOW chunk (the mesh trainer scans)")
            if self.model != "cbow" or not (self.fused_tables
                                            and self.neg_sharing):
                raise ValueError(
                    "-loop-mode fori/unroll runs on the fused-table CBOW "
                    "path (-fused-tables 1 -neg-sharing G -model cbow)")
        if self.scatter_impl == "span":
            if self.model != "cbow":
                raise ValueError("-scatter-impl span runs on the CBOW "
                                 "paths only")
            # composes with -mesh-shape since round 4: the sharded slab
            # body routes per-shard row updates through the span kernel
            # with local ids (parallel/sharded_slab.py, VERDICT r3 item 5)
            if (self.rmw_scatter or self.dedup_block or self.hot_rows
                    or self.neg_stratify or self.neg_dense_hot
                    or self.use_pallas):
                raise ValueError(
                    "-scatter-impl span replaces the plain scatter; it does "
                    "not compose with rmw_scatter/dedup_block/hot_rows/"
                    "neg_stratify/neg_dense_hot/use_pallas")
            if self.span_window <= 0 or self.span_window % 16:
                # the kernel's [2, window, C] VMEM accumulator and window-
                # aligned DMA slices assume dtype sublane tiling (16 rows
                # for bf16, the widest group in use); tested windows are
                # 128/256/512 (advisor r3)
                raise ValueError("-span-window must be a positive multiple "
                                 f"of 16, got {self.span_window}")
            if self.span_chunk <= 0:
                raise ValueError("-span-chunk must be positive, "
                                 f"got {self.span_chunk}")
        if self.rmw_scatter:
            if self.model != "cbow":
                raise ValueError("rmw_scatter runs on the CBOW paths only")
            if not self.mesh_shape and not (self.fused_tables
                                            and self.neg_sharing):
                raise ValueError(
                    "single-chip rmw_scatter runs on the fused-table CBOW "
                    "path (-fused-tables 1 -neg-sharing G -model cbow); on "
                    "a mesh it runs on the sharded slab body instead")
            if (self.use_pallas or self.dedup_block or self.hot_rows
                    or self.neg_stratify or self.neg_dense_hot):
                raise ValueError(
                    "rmw_scatter is the plain-scatter capacity path; it "
                    "does not compose with use_pallas/dedup_block/"
                    "hot_rows/neg_stratify/neg_dense_hot")
            if self.steps_per_chunk > 1 and self.loop_mode == "scan":
                # rmw_scatter exists for 1x-table peak HBM; lax.scan
                # double-buffers the carried table and silently negates it
                import warnings
                warnings.warn(
                    "rmw_scatter with -steps-per-chunk > 1 runs the scan "
                    "path, which double-buffers the carried table (~2x peak "
                    "HBM) — the capacity benefit rmw_scatter exists for "
                    "needs -steps-per-chunk 1 or -loop-mode fori "
                    "(in-place while-loop carry)", stacklevel=2)
        if self.mesh_shape:
            # the sharded bodies have no Pallas or dedup-scatter path —
            # reject rather than silently run a different kernel than asked
            if self.use_pallas:
                raise ValueError("use_pallas is single-chip only (the "
                                 "sharded bodies use the XLA matmul path)")
            if self.dedup_block:
                raise ValueError("dedup_block is single-chip only (the "
                                 "sharded bodies scatter per-shard deltas)")
        if self.fused_tables and not self.neg_sharing:
            raise ValueError(
                "fused_tables requires -neg-sharing G (the fused (V, 2D) "
                "layout exists for the shared-negative path)")
        if self.init not in ("reference", "uniform"):
            raise ValueError(f"init must be 'reference' or 'uniform', got {self.init!r}")
        if self.model not in ("cbow", "skipgram"):
            raise ValueError(f"model must be 'cbow' or 'skipgram', got {self.model!r}")

    @property
    def device_epoch_on(self) -> bool:
        """Resolved -device-epoch: AUTO (None) turns it on unless the
        config needs host-precomputed cold positions (-hot-rows without
        -neg-dense-hot).  Mesh configs build epochs device-side too (the
        built arrays broadcast replicated over ICI; train._segments).  The
        RAW field keeps the None sentinel so dataclasses.replace
        derivatives re-resolve (an explicit 0/1 survives replace
        unchanged, and the validation above rejects only an EXPLICIT 1
        against hot_rows)."""
        if self.device_epoch is None:
            return not (self.hot_rows and not self.neg_dense_hot)
        return bool(self.device_epoch)

    @property
    def lr_scale(self) -> float:
        """Measured synchronous-minibatch LR factor relative to the
        reference's per-example Hogwild LR (see auto_lr field docs)."""
        if not self.auto_lr:
            return 1.0
        if self.bitlevel == 2:
            return 3.0
        if self.bitlevel >= 8:
            return 1.2   # round-5 sweep: 57.8±1.5 vs ref 56.4±0.6
        return 1.0

    @property
    def effective_alpha(self) -> float:
        """The starting LR actually used by the training step."""
        return self.alpha * self.lr_scale

    def replace(self, **kwargs) -> "Word2BitsConfig":
        return dataclasses.replace(self, **kwargs)


# The reference flag spellings, for the CLI layer (reference src/word2bits.cpp:596-611).
REFERENCE_FLAGS = {
    "-train": ("train_file", str),
    "-output": ("output_file", str),
    "-save-vocab": ("save_vocab_file", str),
    "-read-vocab": ("read_vocab_file", str),
    "-bitlevel": ("bitlevel", int),
    "-size": ("size", int),
    "-window": ("window", int),
    "-negative": ("negative", int),
    "-alpha": ("alpha", float),
    "-sample": ("sample", float),
    "-min-count": ("min_count", int),
    "-iter": ("iter", int),
    "-reg": ("reg", float),
    "-binary": ("binary", lambda s: bool(int(s))),
    "-debug": ("debug", int),
    "-save-every-epoch": ("save_every_epoch", lambda s: bool(int(s))),
    "-classes": ("classes", int),
    "-threads": ("threads", int),
    # Extensions beyond the reference:
    "-batch-size": ("batch_size", int),
    "-steps-per-chunk": ("steps_per_chunk", int),
    "-loop-mode": ("loop_mode", str),
    "-segment-tokens": ("segment_tokens", int),
    "-seed": ("seed", int),
    "-dtype": ("dtype", str),
    "-neg-sharing": ("neg_sharing", int),
    "-neg-pool": ("neg_pool", int),
    "-fused-tables": ("fused_tables", lambda s: bool(int(s))),
    "-model": ("model", str),
    "-packed": ("packed", lambda s: bool(int(s))),
    "-checkpoint-dir": ("checkpoint_dir", str),
    "-checkpoint-every-epoch": ("checkpoint_every_epoch",
                                lambda s: bool(int(s))),
    "-resume": ("resume", lambda s: bool(int(s))),
    "-auto-lr": ("auto_lr", lambda s: bool(int(s))),
    "-use-pallas": ("use_pallas", lambda s: bool(int(s))),
    "-context-pallas": ("context_pallas", lambda s: bool(int(s))),
    "-device-epoch": ("device_epoch", lambda s: bool(int(s))),
    "-dedup-block": ("dedup_block", int),
    "-hot-rows": ("hot_rows", int),
    # e.g. -mesh-shape data=2,vocab=4
    "-mesh-shape": ("mesh_shape", lambda s: {
        k.strip(): int(v) for k, v in
        (kv.split("=") for kv in s.split(",") if kv.strip())}),
    "-hot-pallas": ("hot_pallas", lambda s: bool(int(s))),
    "-hot-interleave": ("hot_interleave", lambda s: bool(int(s))),
    "-banded-tile": ("banded_tile", int),
    "-scatter-impl": ("scatter_impl", str),
    "-span-window": ("span_window", int),
    "-span-chunk": ("span_chunk", int),
    "-rmw-scatter": ("rmw_scatter", lambda s: bool(int(s))),
    "-neg-stratify": ("neg_stratify", lambda s: bool(int(s))),
    "-neg-dense-hot": ("neg_dense_hot", lambda s: bool(int(s))),
    "-profile-dir": ("profile_dir", str),
    # word2vec-style spelling: -cbow 1 == cbow, -cbow 0 == skipgram
    "-cbow": ("model", lambda s: "cbow" if int(s) else "skipgram"),
}


def config_from_argv(argv) -> Word2BitsConfig:
    """Parse a reference-style flag list (positional `-flag value` scan,
    reference src/word2bits.cpp:579-611) into a config."""
    kwargs = {}
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok in REFERENCE_FLAGS:
            if i + 1 >= len(argv):
                raise SystemExit(f"Argument missing for {tok}")
            field, conv = REFERENCE_FLAGS[tok]
            kwargs[field] = conv(argv[i + 1])
            i += 2
        else:
            i += 1  # reference ArgPos ignores unknown tokens
    return Word2BitsConfig(**kwargs)
