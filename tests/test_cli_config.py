"""Reference-style flag parsing (reference src/word2bits.cpp:579-611)."""

import pytest

from word2bits_tpu.config import Word2BitsConfig, config_from_argv


def test_reference_defaults():
    cfg = Word2BitsConfig()
    # reference defaults (src/word2bits.cpp:48-59)
    assert cfg.bitlevel == 1
    assert cfg.size == 100
    assert cfg.window == 5
    assert cfg.negative == 5
    assert cfg.alpha == 0.05
    assert cfg.sample == 1e-3
    assert cfg.min_count == 5
    assert cfg.iter == 5
    assert cfg.reg == 0.0
    assert cfg.binary is False
    assert cfg.debug == 2
    assert cfg.save_every_epoch is False
    assert cfg.classes == 0
    assert cfg.threads == 12


def test_parse_reference_quickstart():
    # the README quickstart command line (reference README.md:93)
    argv = ("-train text8 -output vectors.txt -size 200 -window 8 "
            "-negative 24 -threads 4 -iter 5 -min-count 5 -bitlevel 1").split()
    cfg = config_from_argv(argv)
    assert cfg.train_file == "text8"
    assert cfg.output_file == "vectors.txt"
    assert cfg.size == 200 and cfg.window == 8 and cfg.negative == 24
    assert cfg.threads == 4 and cfg.iter == 5
    assert cfg.bitlevel == 1


def test_unknown_tokens_ignored():
    cfg = config_from_argv(["garbage", "-size", "64", "more-garbage"])
    assert cfg.size == 64


def test_missing_value_exits():
    with pytest.raises(SystemExit):
        config_from_argv(["-size"])


def test_cbow_flag_spelling():
    assert config_from_argv(["-cbow", "0"]).model == "skipgram"
    assert config_from_argv(["-cbow", "1"]).model == "cbow"


def test_neg_sharing_validation():
    with pytest.raises(ValueError):
        Word2BitsConfig(batch_size=100, neg_sharing=64)
    Word2BitsConfig(batch_size=128, neg_sharing=64)


def test_auto_batch_size():
    """batch_size=0 resolves to the measured quality-first default (256):
    smaller batches track the reference's per-word Hogwild updates — 5-seed
    sweeps at every bitlevel in the config field docs (at fine grids >= 4
    the LR knob moves the wrong way, so batch is the lever)."""
    assert Word2BitsConfig().batch_size == 256
    assert Word2BitsConfig(bitlevel=4).batch_size == 256
    # explicit value always wins
    assert Word2BitsConfig(bitlevel=4, batch_size=512).batch_size == 512
    assert Word2BitsConfig(batch_size=2048).batch_size == 2048
    with pytest.raises(ValueError):
        Word2BitsConfig(batch_size=-1)


def test_auto_lr_scaling():
    """Batch-aware LR rule (docs/acceptance_notes.md measured sweep): the
    synchronous-minibatch optimum at bitlevel 2 is ~3x the reference's
    per-example-Hogwild alpha (reference src/word2bits.cpp:48); bitlevels
    0 and 1 use alpha verbatim (fp32 diverges above 1x, 1-bit is LR-robust)."""
    from word2bits_tpu.config import Word2BitsConfig, config_from_argv

    assert Word2BitsConfig(bitlevel=2).effective_alpha == pytest.approx(0.15)
    assert Word2BitsConfig(bitlevel=1).effective_alpha == pytest.approx(0.05)
    assert Word2BitsConfig(bitlevel=0).effective_alpha == pytest.approx(0.05)
    assert Word2BitsConfig(bitlevel=4).effective_alpha == pytest.approx(0.05)
    # user-tuned alpha still scales in reference units
    assert Word2BitsConfig(bitlevel=2, alpha=0.1).effective_alpha == pytest.approx(0.3)
    # opt-out uses alpha verbatim
    cfg = config_from_argv(["-bitlevel", "2", "-auto-lr", "0"])
    assert not cfg.auto_lr and cfg.effective_alpha == pytest.approx(0.05)
    cfg2 = config_from_argv(["-bitlevel", "2", "-alpha", "0.05"])
    assert cfg2.effective_alpha == pytest.approx(0.15)


def test_single_chip_only_flags_rejected_on_mesh():
    """The sharded bodies have no Pallas score kernel or dedup-scatter path;
    silently running a different kernel than requested is worse than an
    error (round-2 review finding)."""
    mesh = {"data": 2, "vocab": 4}
    with pytest.raises(ValueError, match="single-chip"):
        Word2BitsConfig(mesh_shape=mesh, neg_sharing=8, use_pallas=True)
    with pytest.raises(ValueError, match="single-chip"):
        Word2BitsConfig(mesh_shape=mesh, dedup_block=512)
    with pytest.raises(ValueError, match="single-chip"):
        Word2BitsConfig(mesh_shape=mesh, neg_sharing=8, banded_tile=128,
                        context_pallas=True)
    with pytest.raises(ValueError, match="single-chip"):
        Word2BitsConfig(mesh_shape=mesh, neg_sharing=8,
                        fused_tables=True, scatter_impl="grmw")
    with pytest.raises(ValueError, match="single-chip"):
        Word2BitsConfig(mesh_shape=mesh, neg_sharing=8, loop_mode="fori")
    Word2BitsConfig(mesh_shape=mesh, neg_sharing=8)  # plain mesh fine


def test_fused_tables_requires_neg_sharing():
    with pytest.raises(ValueError, match="neg-sharing"):
        Word2BitsConfig(fused_tables=True)
    Word2BitsConfig(fused_tables=True, neg_sharing=16)


def test_neg_stratify_needs_two_lanes():
    with pytest.raises(ValueError, match="negative >= 2"):
        Word2BitsConfig(negative=1, neg_stratify=True, hot_rows=16,
                        fused_tables=True, neg_sharing=16)


def test_grmw_requires_fused_path():
    # the capacity scatter runs on the fused-table CBOW path only
    with pytest.raises(ValueError, match="grmw"):
        Word2BitsConfig(scatter_impl="grmw")
    with pytest.raises(ValueError, match="single-chip"):
        Word2BitsConfig(scatter_impl="grmw", fused_tables=True,
                        neg_sharing=64, batch_size=128, mesh_shape="vocab=2")
    with pytest.raises(ValueError, match="compose"):
        Word2BitsConfig(scatter_impl="grmw", fused_tables=True,
                        neg_sharing=64, batch_size=128, rmw_scatter=True)
    cfg = config_from_argv(
        "-fused-tables 1 -neg-sharing 64 -batch-size 128 "
        "-scatter-impl grmw".split())
    assert cfg.scatter_impl == "grmw"


def test_loop_mode_flag():
    with pytest.raises(ValueError, match="loop-mode"):
        Word2BitsConfig(loop_mode="while")
    with pytest.raises(ValueError, match="fused-table"):
        Word2BitsConfig(loop_mode="fori")  # needs the fused CBOW path
    cfg = config_from_argv(
        "-fused-tables 1 -neg-sharing 64 -batch-size 128 "
        "-loop-mode fori".split())
    assert cfg.loop_mode == "fori"


def test_rmw_scan_warning_suppressed_by_fori():
    import warnings
    kw = dict(fused_tables=True, neg_sharing=64, batch_size=128,
              rmw_scatter=True, steps_per_chunk=4)
    with pytest.warns(UserWarning, match="double-buffers"):
        Word2BitsConfig(**kw)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        Word2BitsConfig(**kw, loop_mode="fori")


def test_dense_hot_fine_grid_warns():
    # measured -7pt regime (ACCEPTANCE.md): dense-hot at bitlevel >= 4
    # must warn; tune never offers it there (VERDICT r4 item 7)
    import warnings
    kw = dict(neg_dense_hot=True, hot_rows=256, fused_tables=True,
              neg_sharing=16, batch_size=128)
    with pytest.warns(UserWarning, match="bitlevel"):
        Word2BitsConfig(bitlevel=4, **kw)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        Word2BitsConfig(bitlevel=1, **kw)

    from word2bits_tpu.tune import variants
    names4 = [n for n, _, _ in variants(Word2BitsConfig(bitlevel=4), 70_000)]
    names1 = [n for n, _, _ in variants(Word2BitsConfig(bitlevel=1), 70_000)]
    assert "dense-hot" not in names4
    assert "dense-hot" in names1


def test_context_pallas_validation():
    kw = dict(fused_tables=True, neg_sharing=64, batch_size=128)
    with pytest.raises(ValueError, match="banded"):
        Word2BitsConfig(context_pallas=True, **kw)
    with pytest.raises(ValueError, match="reg"):
        Word2BitsConfig(context_pallas=True, banded_tile=128, reg=0.1, **kw)
    # the slab CBOW path (no fused tables) is allowed since the kernel
    # landed there too (round 5) — only non-CBOW models are rejected
    Word2BitsConfig(context_pallas=True, banded_tile=128)
    with pytest.raises(ValueError, match="CBOW"):
        Word2BitsConfig(context_pallas=True, banded_tile=128,
                        model="skipgram")
    cfg = config_from_argv(
        "-fused-tables 1 -neg-sharing 64 -batch-size 128 -banded-tile 256 "
        "-context-pallas 1".split())
    assert cfg.context_pallas
