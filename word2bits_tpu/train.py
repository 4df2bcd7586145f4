"""Training orchestration: the reference TrainModel
(reference src/word2bits.cpp:518-577) re-designed for TPU.

Epoch loop structure matches the reference: vocab build (or cached read),
param init, unigram table, then per epoch a full pass over the corpus with
fresh subsampling randomness, epoch-loss telemetry, optional per-epoch vector
export, and a final vector write.  The reference's per-epoch
pthread_create/join of Hogwild workers becomes a host loop over jitted
`lax.scan` chunks of synchronous minibatch steps (the device never waits on
the host between steps within a chunk).

Extensions beyond the reference (SURVEY.md section 5): full train-state
checkpointing (u, v, epoch, RNG) for real resume — the reference can only
export vectors, not resume.
"""

from __future__ import annotations

import math
import os
import sys
import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from word2bits_tpu.config import Word2BitsConfig
from word2bits_tpu.data.corpus import build_vocab, encode_corpus
from word2bits_tpu.data.pipeline import iter_epoch_segments
from word2bits_tpu.data.vocab import Vocab
from word2bits_tpu.io.vectors import output_vectors, write_vectors
from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
from word2bits_tpu.models.cbow_slab import make_slab_train_chunk
from word2bits_tpu.models.init import init_params
from word2bits_tpu.sampling.unigram import AliasTable, build_alias_table


@dataclass
class TrainResult:
    vocab: Vocab
    u: np.ndarray
    v: np.ndarray
    epoch_losses: List[float]
    words_per_sec: float  # training words consumed per wall-second of the
    #                       train loop (device fetches excluded; see fetch_s)
    steps: int
    # wall seconds spent fetching tables device->host (checkpoints + the
    # final export source) — at flagship scale one fetch is ~12 GB through
    # the blocked tunnel path, which round 4's accounting folded into
    # words_per_sec and understated the training rate ~25x
    fetch_s: float = 0.0


def _log(cfg: Word2BitsConfig, msg: str, end="\n"):
    if cfg.debug > 0:
        print(msg, end=end, flush=True)


def prepare(cfg: Word2BitsConfig) -> Tuple[Vocab, np.ndarray]:
    """Vocab (built or cached) + encoded corpus ids."""
    if cfg.train_file is None:
        raise ValueError("train_file is required")
    if cfg.read_vocab_file:
        vocab = Vocab.load(cfg.read_vocab_file, min_count=cfg.min_count)
    else:
        vocab = build_vocab(cfg.train_file, min_count=cfg.min_count)
    if cfg.save_vocab_file:
        vocab.save(cfg.save_vocab_file)
    _log(cfg, f"Vocab size: {vocab.size}")
    _log(cfg, f"Words in train file: {vocab.train_words}")
    encoded = encode_corpus(cfg.train_file, vocab)
    return vocab, encoded


def segment_capacity(cfg: Word2BitsConfig, n_tokens: int) -> Tuple[int, int]:
    """(seg_tokens, capacity): epoch arrays are padded to a fixed capacity
    so chunk shapes never change; corpora beyond cfg.segment_tokens stream
    through the device in fixed-size segments (C10).  Shared by train() and
    tune.measure() so the tuner times exactly the shapes train() runs."""
    B, S = cfg.batch_size, cfg.steps_per_chunk
    seg_tokens = min(n_tokens, cfg.segment_tokens) or 1
    capacity = ((seg_tokens + S * B + 8 + 1023) // 1024) * 1024
    return seg_tokens, capacity


@dataclass
class Engine:
    """One training engine: the jitted chunk callable plus its state.

    chunk_fn signature is uniform across model families / table layouts:
        u, v, loss = chunk_fn(u, v, tokens, sents, prob, alias, scalars, key)
    (fused mode carries the interleaved table in `u` and a zero-size
    sentinel in `v`).  `seg_cold["pos"]` must be set to the current
    segment's cold-position map before calling when cfg.hot_rows > 0 on the
    fused path.  Shared by train() and tune() so what tune times is exactly
    what train runs.
    """
    chunk_fn: Optional[Callable]
    u: Optional[jnp.ndarray]
    v: Optional[jnp.ndarray]
    table: AliasTable
    sharded: Optional[object]
    fused_mode: bool
    seg_cold: dict
    # (row, col) zero padding on the fused table storage (rmw_scatter packs
    # it to the TPU sublane-group / 128-lane tile); exports slice it off
    table_pad: tuple = (0, 0)


def build_engine(cfg: Word2BitsConfig, vocab: Vocab, u, v,
                 hyper: CBOWHyper, B: int, S: int) -> Engine:
    """Construct the chunk engine for a config (the reference's TrainModel
    thread-spawn setup, src/word2bits.cpp:518-545, becomes table/param/
    kernel selection here)."""
    V = vocab.size
    strat_lanes = None
    dense_hot = None
    if cfg.neg_stratify:
        # stratified hot/cold negative draws (see sampling/unigram.py): the
        # chunk receives the (hot, cold) alias-array pairs through the same
        # two positional slots as the plain table
        from word2bits_tpu.sampling.unigram import build_stratified_tables
        st = build_stratified_tables(vocab.unigram_weights(), cfg.hot_rows)
        strat_lanes = st.lane_split(cfg.negative)
        table = AliasTable(prob=(st.hot.prob, st.cold.prob),
                           alias=(st.hot.alias, st.cold.alias))
    elif cfg.neg_dense_hot:
        # dense hot negatives: the chunk's alias slots carry the COLD
        # stratum's table; hot weights bake into the jit as constants
        from word2bits_tpu.sampling.unigram import build_stratified_tables
        if cfg.hot_rows >= V:
            raise ValueError("-neg-dense-hot needs -hot-rows < vocab size")
        st = build_stratified_tables(vocab.unigram_weights(), cfg.hot_rows)
        dense_hot = st.dense_split(cfg.negative)
        table = st.cold
    else:
        table = build_alias_table(vocab.unigram_weights())
    sharded = None
    chunk_fn = None
    seg_cold = {"pos": None}
    # storage padding defaults; the branches below overwrite when a padded
    # layout applies (bound unconditionally so a future model family reaching
    # the slab elif cannot hit an UnboundLocalError — advisor r3)
    vpad = cpad = 0
    slab_pad = (0, 0)
    if cfg.mesh_shape:
        # multi-chip path: vocab-sharded params + data-parallel batch over a
        # (data, vocab) mesh, scanning S steps per dispatch exactly like the
        # single-chip chunk (parallel/chunk.py)
        from word2bits_tpu.parallel.trainer import ShardedTrainer
        sharded = ShardedTrainer(cfg, V, u, v, dense_hot=dense_hot)
        u = v = None
    elif cfg.fused_tables and cfg.neg_sharing and cfg.model == "cbow":
        # interleaved (V, 2D) table path: one scatter covers u + center-v
        from word2bits_tpu.models.cbow_fused import (
            interleave, make_fused_train_chunk)
        vpad = cpad = 0
        if cfg.rmw_scatter or cfg.scatter_impl == "grmw":
            # pad the table storage to what the RMW kernels' HBM DMA can
            # slice (kernels/scatter_pallas.py, kernels/group_rmw.py): rows
            # to the dtype sublane group, columns to the 128-lane tile;
            # padding stays zero and is sliced off at export
            # (tests/test_rmw_chunk.py)
            from word2bits_tpu.kernels.scatter_pallas import group_rows
            vpad = (-V) % group_rows(u.dtype)
            cpad = (-2 * cfg.size) % 128
        elif cfg.scatter_impl == "span":
            # spanning sweep storage: rows to the sweep window, columns to
            # the 128-lane tile (kernels/span_scatter.py); same export trim
            vpad = (-V) % cfg.span_window
            cpad = (-2 * cfg.size) % 128
        fused_fn = make_fused_train_chunk(hyper, V, B, S,
                                          neg_sharing=cfg.neg_sharing,
                                          use_pallas=cfg.use_pallas,
                                          dedup_block=cfg.dedup_block,
                                          neg_pool=cfg.neg_pool,
                                          hot_rows=cfg.hot_rows,
                                          strat_lanes=strat_lanes,
                                          dense_hot=dense_hot,
                                          hot_pallas=cfg.hot_pallas,
                                          banded=cfg.banded_tile,
                                          rmw_scatter=cfg.rmw_scatter,
                                          col_pad=cpad,
                                          scatter_impl=cfg.scatter_impl,
                                          span_window=cfg.span_window,
                                          span_chunk=cfg.span_chunk,
                                          loop_mode=cfg.loop_mode,
                                          context_pallas=cfg.context_pallas)

        # -hot-rows: the per-segment cold-row compaction map, updated by the
        # segment loop below (an explicit jit arg; the holder just threads it
        # through this fixed chunk_fn signature)
        def chunk_fn(u_, v_, *args):
            # u_ carries the fused table; v_ is a zero-size sentinel
            if cfg.hot_rows:
                table_, loss_ = fused_fn(u_, *args, seg_cold["pos"])
            else:
                table_, loss_ = fused_fn(u_, *args)
            return table_, v_, loss_

        if vpad or cpad:
            # Assemble the padded fused table HOST-side and ship it in ONE
            # transfer: on-device interleave + pad holds u + v + the fused
            # copy + pad's fresh buffer (~2x table peak — 22.5 GB at the
            # 3.7M x 800d flagship vs 15.75 GB HBM), the exact copy-OOM the
            # rmw path exists to avoid.  Padding stays zero; exports slice
            # it off via table_pad (tests/test_rmw_chunk.py).
            D_ = cfg.size
            uh, vh = np.asarray(u), np.asarray(v)
            for a_ in (u, v):
                if hasattr(a_, "delete"):
                    a_.delete()   # free device halves before the upload
            fused_h = np.zeros((V + vpad, 2 * D_ + cpad), dtype=uh.dtype)
            fused_h[:V, :D_] = uh
            fused_h[:V, D_:2 * D_] = vh
            del uh, vh
            u = jnp.asarray(fused_h)
            del fused_h
        else:
            u = interleave(u, v)
        v = jnp.zeros((0,), u.dtype)
    elif cfg.model == "skipgram":
        from word2bits_tpu.models.skipgram import make_skipgram_train_chunk
        chunk_fn = make_skipgram_train_chunk(hyper, V, B, S,
                                             neg_sharing=cfg.neg_sharing,
                                             dedup_block=cfg.dedup_block,
                                             neg_pool=cfg.neg_pool,
                                             hot_rows=cfg.hot_rows,
                                             dense_hot=dense_hot)
    else:
        chunk_fn = make_slab_train_chunk(hyper, V, B, S,
                                         neg_sharing=cfg.neg_sharing,
                                         use_pallas=cfg.use_pallas,
                                         dedup_block=cfg.dedup_block,
                                         neg_pool=cfg.neg_pool,
                                         banded=cfg.banded_tile,
                                         scatter_impl=cfg.scatter_impl,
                                         span_window=cfg.span_window,
                                         span_chunk=cfg.span_chunk,
                                         context_pallas=cfg.context_pallas)
        if cfg.scatter_impl == "span":
            # split-table sweep storage: pad u and v host-side (rows to the
            # sweep window, cols to the 128-lane tile); exports/checkpoints
            # trim via table_pad (_uv)
            svpad = (-V) % cfg.span_window
            scpad = (-cfg.size) % 128
            if svpad or scpad:
                padw = ((0, svpad), (0, scpad))
                u = jnp.asarray(np.pad(np.asarray(u), padw))
                v = jnp.asarray(np.pad(np.asarray(v), padw))
            slab_pad = (svpad, scpad)

    fused_mode = bool(sharded is None and cfg.fused_tables
                      and cfg.neg_sharing and cfg.model == "cbow")
    if fused_mode and (cfg.rmw_scatter
                       or cfg.scatter_impl in ("span", "grmw")):
        pad = (vpad, cpad)
    elif sharded is None and cfg.model == "cbow" and not fused_mode \
            and cfg.scatter_impl == "span":
        pad = slab_pad
    else:
        pad = (0, 0)
    return Engine(chunk_fn=chunk_fn, u=u, v=v, table=table, sharded=sharded,
                  fused_mode=fused_mode, seg_cold=seg_cold, table_pad=pad)


def train(cfg: Word2BitsConfig,
          vocab: Optional[Vocab] = None,
          encoded: Optional[np.ndarray] = None,
          max_steps: Optional[int] = None,
          on_epoch_end: Optional[Callable] = None) -> TrainResult:
    """Full training run. `vocab`/`encoded` may be precomputed (bench path)."""
    if vocab is None or encoded is None:
        vocab, encoded = prepare(cfg)

    V, D = vocab.size, cfg.size
    B, S, W = cfg.batch_size, cfg.steps_per_chunk, cfg.window
    hyper = CBOWHyper(bitlevel=cfg.bitlevel, size=D, window=W,
                      negative=cfg.negative, reg=cfg.reg)

    dtype = jnp.dtype(cfg.dtype)
    tables_gb = 2 * V * D * dtype.itemsize / 1e9
    if (S > 1 and cfg.loop_mode == "scan" and not cfg.mesh_shape
            and tables_gb * 2 > 12.0):
        # lax.scan double-buffers the carried tables (peak ~= 2x tables +
        # temps; the measured single-chip OOM wall is ~8 GB of tables on a
        # 16 GB v5e — ARCHITECTURE.md capacity table).  fori keeps the
        # while-loop carry in place, and the per-step donated path keeps
        # peak at 1x tables (tools/capacity_probe.py --analyze).
        _log(cfg, f"WARNING: tables are {tables_gb:.1f} GB; the scan path "
                  f"(steps_per_chunk={S}) double-buffers them and will "
                  "likely OOM one chip.  Use -loop-mode fori "
                  "-scatter-impl grmw (in-place while-loop carry + in-place "
                  "scatter; XLA's scatter copies the table even donated — "
                  "ARCHITECTURE.md), -dtype bfloat16, or -mesh-shape to "
                  "vocab-shard.")
    # host-side params: build_engine decides the device layout (the fused
    # rmw path assembles a padded table host-side to keep the chip at 1x
    # table peak; eager device halves would force an OOMing round-trip)
    u, v = init_params(V, D, init=cfg.init, seed=cfg.seed, dtype=dtype,
                       as_numpy=True)

    key = jax.random.PRNGKey(cfg.seed)
    start_epoch = 0
    words_done = 0.0
    ckpt_path = (os.path.join(cfg.checkpoint_dir, "state.npz")
                 if cfg.checkpoint_dir else None)
    if ckpt_path and cfg.resume and os.path.exists(ckpt_path):
        cu, cv, cepoch, ckey, cwords = load_checkpoint(ckpt_path)
        # stay host-side for the same reason as init_params(as_numpy=True)
        npdt = jnp.dtype(dtype)
        u, v = cu.astype(npdt, copy=False), cv.astype(npdt, copy=False)
        key = ckey
        start_epoch = cepoch + 1
        words_done = cwords
        _log(cfg, f"Resumed from {ckpt_path} at epoch {start_epoch}")

    engine = build_engine(cfg, vocab, u, v, hyper, B, S)
    chunk_fn, table = engine.chunk_fn, engine.table
    sharded, fused_mode = engine.sharded, engine.fused_mode
    seg_cold = engine.seg_cold
    u, v = engine.u, engine.v

    def _uv(u_, v_):
        """Split params for export/checkpoint (fused mode interleaves).

        Multi-GB tables come back through to_numpy_blocked: the axon tunnel
        wedges on one-shot materializations at flagship scale
        (word2bits_tpu/utils/fetch.py postmortem)."""
        from word2bits_tpu.utils.fetch import to_numpy_blocked
        if fused_mode:
            from word2bits_tpu.models.cbow_fused import deinterleave
            vp, cp = engine.table_pad
            if vp or cp:
                # trim rmw_scatter's storage padding HOST-side and return
                # numpy (all consumers np.asarray anyway): a device slice
                # would briefly hold a second near-full table — the
                # capacity path exists precisely because one table is all
                # that fits
                t = to_numpy_blocked(u_)
                t = t[:t.shape[0] - vp, :t.shape[1] - cp]
                half = t.shape[1] // 2
                return t[:, :half], t[:, half:]
            return deinterleave(u_)
        vp, cp = engine.table_pad
        if vp or cp:
            # split-table span storage: trim the sweep padding host-side
            un, vn = to_numpy_blocked(u_), to_numpy_blocked(v_)
            return (un[:un.shape[0] - vp, :un.shape[1] - cp],
                    vn[:vn.shape[0] - vp, :vn.shape[1] - cp])
        return u_, v_

    train_words = vocab.train_words
    denom = float(cfg.iter) * train_words + 1.0
    seg_tokens, capacity = segment_capacity(cfg, len(encoded))
    total_len = max(len(encoded), 1)

    epoch_losses: List[float] = []
    total_steps = 0
    final_uv = None  # last epoch's fetched (u, v), reused by the export
    cold_width = [0]  # -hot-rows: grows monotonically across segments/epochs

    # device-side epoch preparation (-device-epoch 1): upload the encoded
    # corpus once; per-epoch subsample+compact+sentence-id runs as one jitted
    # pass (data/device_pipeline.py).  Segments of -segment-tokens raw
    # tokens build device-side too (one fixed [nseg, seg_len] upload,
    # per-segment key fold), and on a mesh the built arrays are broadcast
    # replicated over ICI before the sharded chunk consumes them
    # (VERDICT r2 item 7 — the flagship mesh config no longer falls back
    # to the host epoch rebuild).
    use_device_epoch = bool(cfg.device_epoch_on)
    if use_device_epoch:
        from word2bits_tpu.data.device_pipeline import \
            make_device_epoch_builder
        from word2bits_tpu.data.pipeline import subsample_keep_probs
        dev_seg_len = int(max(min(len(encoded), seg_tokens), 1))
        nseg_dev = max(1, -(-len(encoded) // dev_seg_len))
        enc_np = np.asarray(encoded, np.int32)
        dev_pad = nseg_dev * dev_seg_len - len(enc_np)
        if dev_pad:
            # pad the tail segment with `</s>` (id 0): subsample-exempt and
            # emits no kept tokens, so it only appends empty sentences
            enc_np = np.concatenate([enc_np, np.zeros(dev_pad, np.int32)])
        encoded_dev = jnp.asarray(enc_np.reshape(nseg_dev, dev_seg_len))
        keep_probs_dev = jnp.asarray(subsample_keep_probs(
            vocab.counts, cfg.sample, train_words).astype(np.float32))
        epoch_builder = make_device_epoch_builder(capacity, W)
        # keyed by (seed, epoch[, segment]), independent of the training key
        # stream, so resume reproduces the same subsampling as the host
        # pipeline's default_rng([seed, epoch])
        ep_key_base = jax.random.PRNGKey(cfg.seed)
        rep_sharding = None
        if sharded is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            rep_sharding = NamedSharding(sharded.mesh, PartitionSpec())

    profiling = False
    if cfg.profile_dir:
        try:
            jax.profiler.start_trace(cfg.profile_dir)
            profiling = True
        except Exception as e:  # axon backends may not support tracing
            _log(cfg, f"WARNING: profiler unavailable ({e})")

    # Sync the parameter upload BEFORE the training clock starts: on the
    # axon backend jnp.asarray transfers complete lazily at the next host
    # sync, which used to land inside the first segment's n_tokens fetch —
    # a 12.3 GB flagship table (~8 min of tunnel) misattributed to the
    # train loop (round-5 diagnosis: "[seg] build 478s", of which the
    # builder itself was ~10 s).  One scalar fetch forces it to finish
    # here, where it is startup I/O.
    t_up = time.perf_counter()
    for arr in (u, v):
        if arr is not None and hasattr(arr, "shape") and getattr(
                arr, "size", 0) and not isinstance(arr, np.ndarray):
            np.asarray(arr[(0,) * arr.ndim])
    if cfg.debug > 2:
        _log(cfg, f"[init] param upload sync {time.perf_counter() - t_up:.1f}s")

    t_train0 = time.perf_counter()
    fetch_s = 0.0
    words_at_start = words_done  # resumed runs report THIS run's rate only
    stop = False

    for epoch in range(start_epoch, cfg.iter):
        _log(cfg, f"Starting epoch: {epoch}")
        # per-epoch derived stream: fresh subsampling randomness each epoch,
        # reproducible after resume
        epoch_rng = np.random.default_rng([cfg.seed, epoch])
        # loss accumulates ON DEVICE; the host fetches it only when printing
        # progress (time-gated) or at epoch end — per-chunk float(loss) would
        # force a sync every dispatch, untenable at steps_per_chunk=1
        loss_acc = jnp.float32(0.0)
        epoch_loss = 0.0
        t_print = 0.0
        t0 = time.perf_counter()
        def _segments():
            """Yield (tokens_dev, sents_dev, n_tokens, source_len)."""
            if use_device_epoch:
                ek0 = jax.random.fold_in(ep_key_base, epoch)
                for si in range(nseg_dev):
                    # single-segment keeps the historical (seed, epoch) key;
                    # multi-segment folds the segment index in as well
                    ek = (ek0 if nseg_dev == 1
                          else jax.random.fold_in(ek0, si))
                    t, s, nt = epoch_builder(encoded_dev[si], keep_probs_dev,
                                             ek)
                    if rep_sharding is not None:
                        # ICI broadcast so the sharded chunk's replicated
                        # in_specs see mesh-placed inputs (no host bounce)
                        t = jax.device_put(t, rep_sharding)
                        s = jax.device_put(s, rep_sharding)
                    src = dev_seg_len if si < nseg_dev - 1 \
                        else dev_seg_len - dev_pad
                    yield t, s, int(nt), src  # one scalar fetch/segment
            else:
                for ea in iter_epoch_segments(encoded, vocab.counts,
                                              cfg.sample, train_words, W,
                                              epoch_rng, seg_tokens,
                                              capacity=capacity):
                    if cfg.hot_rows and fused_mode:
                        # slab hot/cold scatter split (single-chip fused
                        # path only; the sharded dense-hot path needs no
                        # cold-position precompute)
                        from word2bits_tpu.data.pipeline import cold_positions
                        n_rows = capacity // B + S + 2
                        cp = cold_positions(ea.tokens, B, W, n_rows,
                                            cfg.hot_rows,
                                            min_width=cold_width[0])
                        cold_width[0] = cp.shape[1]  # stable width => 1 jit
                        seg_cold["pos"] = jnp.asarray(cp)
                    yield (jnp.asarray(ea.tokens), jnp.asarray(ea.sent_ids),
                           ea.n_tokens, ea.source_len)

        t_seg = time.perf_counter()
        for tokens_dev, sents_dev, seg_n_tokens, source_len in _segments():
            if cfg.debug > 2:
                # -debug 3: per-segment wall split (epoch build vs chunk
                # dispatch loop) — the round-5 flagship rate investigation
                _log(cfg, f"[seg] build {time.perf_counter() - t_seg:.2f}s "
                          f"kept={seg_n_tokens}")
            n_centers = max(seg_n_tokens, 1)
            # this segment accounts for its share of the epoch's train_words
            seg_words = train_words * source_len / total_len
            wca_per_step = B * seg_words / n_centers
            n_steps = math.ceil(seg_n_tokens / B)
            n_chunks = max(1, math.ceil(n_steps / S))

            for ci in range(n_chunks):
                key, sub = jax.random.split(key)
                base0 = W + ci * S * B
                chunk_steps = min(S, n_steps - ci * S)
                scalars = ChunkScalars(
                    base0=jnp.int32(base0),
                    alpha0=jnp.float32(cfg.effective_alpha),
                    wca_start=jnp.float32(words_done),
                    wca_per_step=jnp.float32(wca_per_step),
                    denom=jnp.float32(denom),
                )
                if sharded is not None:
                    loss = sharded.run_chunk(tokens_dev, sents_dev,
                                             table.prob, table.alias,
                                             scalars, sub)
                else:
                    u, v, loss = chunk_fn(u, v, tokens_dev, sents_dev,
                                          table.prob, table.alias, scalars, sub)
                words_done += chunk_steps * wca_per_step
                loss_acc = loss_acc + loss
                total_steps += S
                if profiling:
                    # trace covers exactly one chunk (compile + execute)
                    jax.profiler.stop_trace()
                    profiling = False
                    _log(cfg, f"Wrote profiler trace to {cfg.profile_dir}")
                if cfg.debug > 1 and time.perf_counter() - t_print > 0.5:
                    t_print = time.perf_counter()
                    epoch_loss = float(loss_acc)  # host fetch = device sync
                    a0 = cfg.effective_alpha
                    alpha_now = max(a0 * (1 - words_done / denom), a0 * 1e-4)
                    wps = (words_done - words_at_start) / max(
                        time.perf_counter() - t_train0, 1e-9)
                    print(f"\rAlpha: {alpha_now:.6f}  "
                          f"Progress: {min(words_done / denom * 100, 100.0):.2f}%  "
                          f"Cost: {epoch_loss:.2f} "
                          f"Words/sec: {wps / 1000:.2f}k  ",
                          end="", flush=True)
                if max_steps is not None and total_steps >= max_steps:
                    stop = True
                    break
            if cfg.debug > 2:
                epoch_loss = float(loss_acc)  # sync: attribute time honestly
                _log(cfg, f"[seg] chunks {n_chunks} "
                          f"({time.perf_counter() - t_seg:.2f}s total)")
            t_seg = time.perf_counter()
            if stop:
                break
        # exact end-of-epoch word count (the reference's wca reaches
        # (epoch+1)*train_words as all threads finish)
        if not stop:
            words_done = (epoch + 1) * float(train_words)
        if cfg.debug > 1:
            print()
        epoch_loss = float(loss_acc)
        _log(cfg, f"Epoch Loss: {epoch_loss:.6f}")
        epoch_losses.append(epoch_loss)

        last = stop or epoch == cfg.iter - 1
        # -checkpoint-every-epoch 0: checkpoint only after the final epoch —
        # at flagship scale every checkpoint is a full-table tunnel fetch
        # (~12 GB), so the cadence is a flag
        want_ckpt = bool(ckpt_path) and (cfg.checkpoint_every_epoch or last)
        if sharded is not None and (cfg.save_every_epoch or want_ckpt
                                    or on_epoch_end or last):
            u, v = sharded.params()
        if cfg.save_every_epoch or want_ckpt or on_epoch_end or last:
            t_f = time.perf_counter()
            uu, vv = _uv(u, v)
            fetch_s += time.perf_counter() - t_f
            if last:
                # reuse for the final export below — at flagship scale a
                # second _uv is a second multi-GB device fetch
                final_uv = (uu, vv)
        if cfg.save_every_epoch and cfg.output_file and cfg.classes == 0:
            _write_output(f"{cfg.output_file}_epoch{epoch}", vocab, uu, vv, cfg)
        if want_ckpt:
            os.makedirs(cfg.checkpoint_dir, exist_ok=True)
            save_checkpoint(ckpt_path, uu, vv, epoch, key, words_done)
        if on_epoch_end is not None:
            on_epoch_end(epoch, np.asarray(uu), np.asarray(vv), epoch_loss)
        if stop:
            break

    if final_uv is not None:
        # free the device table before export/eval consumers run: at
        # flagship scale the chip cannot hold the training table AND any
        # further device work (round-4 export OOM postmortem).  Only
        # buffers final_uv does NOT alias (the padded paths return host
        # copies; the plain path returns the same objects — deleting those
        # would hand the caller dead arrays)
        for buf in (u, v):
            if (buf is not final_uv[0] and buf is not final_uv[1]
                    and hasattr(buf, "delete")):
                try:
                    buf.delete()
                except Exception:
                    pass
        u, v = final_uv
    else:
        if sharded is not None and u is None:
            u, v = sharded.params()
        t_f = time.perf_counter()
        u, v = _uv(u, v)
        fetch_s += time.perf_counter() - t_f
    wall = time.perf_counter() - t_train0 - fetch_s
    wps = (words_done - words_at_start) / max(wall, 1e-9)

    if cfg.output_file:
        if cfg.classes == 0:
            _write_output(cfg.output_file, vocab, u, v, cfg)
        else:
            # reference quirk: -classes != 0 creates an *empty* output file
            # (src/word2bits.cpp:561-576 writes nothing when classes != 0)
            _log(cfg, "WARNING: -classes is parsed but unimplemented in the "
                      "reference; writing an empty file for parity")
            open(cfg.output_file, "wb").close()

    return TrainResult(vocab=vocab, u=np.asarray(u), v=np.asarray(v),
                       epoch_losses=epoch_losses, words_per_sec=wps,
                       steps=total_steps, fetch_s=round(fetch_s, 1))


def _write_output(path: str, vocab: Vocab, u, v, cfg: Word2BitsConfig):
    vecs = output_vectors(np.asarray(u), np.asarray(v), cfg.bitlevel)
    write_vectors(path, vocab.words, vecs, binary=cfg.binary)
    if cfg.packed and cfg.bitlevel in (1, 2):
        from word2bits_tpu.io.packed import write_packed
        write_packed(path + ".pack", vocab.words, vecs, cfg.bitlevel)


# ---------------------------------------------------------------------------
# Checkpoint / resume (extension over the reference's export-only snapshots)
# ---------------------------------------------------------------------------

def _ckpt_encode(a):
    """numpy cannot serialize bfloat16 (saves as a void dtype).  bf16
    params are stored as their uint16 bit pattern + a dtype tag (exact,
    half the bytes of the old fp32 upcast — 23.7 GB -> 11.8 GB at the
    3.7M x 800d flagship); everything else upcasts to float32."""
    a = np.asarray(a)
    if a.dtype == jnp.bfloat16:
        return a.view(np.uint16), "bfloat16"
    return a.astype(np.float32, copy=False), "float32"


def _ckpt_decode(z, name):
    a = z[name]
    tag = name + "_dtype"
    if tag in z.files and str(z[tag]) == "bfloat16":
        return a.view(jnp.bfloat16)
    return a


def save_checkpoint(path: str, u, v, epoch: int, key, words_done: float):
    ue, ut = _ckpt_encode(u)
    ve, vt = _ckpt_encode(v)
    np.savez(path, u=ue, v=ve, u_dtype=ut, v_dtype=vt, epoch=epoch,
             key=np.asarray(key), words_done=words_done)


def load_checkpoint(path: str):
    z = np.load(path)
    return (_ckpt_decode(z, "u"), _ckpt_decode(z, "v"), int(z["epoch"]),
            jnp.asarray(z["key"]), float(z["words_done"]))
