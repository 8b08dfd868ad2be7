"""Config layer tests: INI surface compat with the reference (default.ini),
boolean-parsing fix (quirk #8), round-trip, workspace semantics."""

import configparser
from pathlib import Path

import pytest

from rawaudiovae_kelsey_tpu.config import (
    Config,
    create_workspace,
    load_config,
    save_config,
)

REFERENCE_DEFAULT_INI = """\
[audio]
sampling_rate = 44100
hop_length = 128
segment_length = 1024

[dataset]
datapath = {datapath}
test_dataset = test_audio
generate_test = True
check_audio = True
check_dataset = True
workspace =
run_number = 0
total_frames =

[VAE]
latent_dim = 256
n_units = 2048
kl_beta = 0.0001
device = cuda:0

[training]
epochs = 500
save_best_model_after = 80
learning_rate = 0.0001
batch_size = 131072
checkpoint_interval = 90
loss_reduction = mean # either mean for average loss, or sum for total loss, see torch.nn.MSEloss

[notes]
additional_notes =

[extra]
normalize_examples = False
example_length = 10
plot_model = True

description = nospectral_workstation
start =
end =
time_elapsed =
"""


@pytest.fixture
def ref_ini(tmp_path):
    p = tmp_path / "default.ini"
    p.write_text(REFERENCE_DEFAULT_INI.format(datapath=tmp_path))
    return p


def test_reference_default_ini_loads(ref_ini, tmp_path):
    cfg = load_config(ref_ini)
    assert cfg.audio.sampling_rate == 44100
    assert cfg.audio.hop_length == 128
    assert cfg.audio.segment_length == 1024
    assert cfg.dataset.datapath == str(tmp_path)
    assert cfg.dataset.generate_test is True
    assert cfg.vae.latent_dim == 256
    assert cfg.vae.n_units == 2048
    assert cfg.vae.kl_beta == pytest.approx(1e-4)
    assert cfg.training.epochs == 500
    assert cfg.training.batch_size == 131072
    assert cfg.training.learning_rate == pytest.approx(1e-4)
    assert cfg.training.loss_reduction == "mean"  # inline comment stripped
    assert cfg.extra.description == "nospectral_workstation"
    # [tpu] section absent → defaults
    assert cfg.tpu.backend == "xla"


def test_generate_test_false_is_false(tmp_path):
    """Reference bug (train.py:65): 'False' string was truthy.  We fix it."""
    ini = tmp_path / "c.ini"
    ini.write_text("[dataset]\ngenerate_test = False\n")
    cfg = load_config(ini)
    assert cfg.dataset.generate_test is False


def test_iterable_keys(tmp_path):
    ini = tmp_path / "c.ini"
    ini.write_text(
        "[training]\ntotal_num_frames = 154314100\nbatch_size = 4096\n"
        "checkpoint_interval = 754\n"
    )
    cfg = load_config(ini)
    assert cfg.training.total_num_frames == 154314100
    # total_num_batches math of train_iterable.py:74
    assert cfg.training.total_num_frames // cfg.training.batch_size == 37674


def test_unknown_keys_roundtrip(tmp_path):
    ini = tmp_path / "c.ini"
    ini.write_text("[mystuff]\nfoo = bar\n[audio]\nweird_key = 7\n")
    cfg = load_config(ini)
    out = tmp_path / "out.ini"
    save_config(cfg, out)
    cp = configparser.ConfigParser(allow_no_value=True)
    cp.read(out)
    assert cp.get("mystuff", "foo") == "bar"
    assert cp.get("audio", "weird_key") == "7"


def test_roundtrip_preserves_values(ref_ini, tmp_path):
    cfg = load_config(ref_ini)
    cfg.training.best_epoch = "123"
    out = tmp_path / "rt.ini"
    save_config(cfg, out)
    cfg2 = load_config(out)
    assert cfg2.training.best_epoch == "123"
    assert cfg2.training.batch_size == cfg.training.batch_size
    assert cfg2.vae.kl_beta == cfg.vae.kl_beta


def test_segment_hop_validation(tmp_path):
    ini = tmp_path / "c.ini"
    ini.write_text("[audio]\nsegment_length = 1000\nhop_length = 128\n")
    with pytest.raises(ValueError):
        load_config(ini)  # dataset.py:97-98 contract


def test_missing_config_raises():
    with pytest.raises(FileNotFoundError):
        load_config("/nonexistent/path.ini")


def test_workspace_autoincrement(tmp_path):
    cfg = Config()
    cfg.dataset.datapath = str(tmp_path)
    cfg.extra.description = "desc"
    ws1 = create_workspace(cfg)
    ws2 = create_workspace(cfg)
    assert ws1.workdir.name == "run-000"
    assert ws2.workdir.name == "run-001"
    assert ws1.checkpoint_dir.is_dir()
    assert ws1.log_dir.is_dir()
    assert cfg.dataset.workspace == str(ws2.workdir.resolve())


def test_workspace_snapshot(tmp_path):
    cfg = Config()
    cfg.dataset.datapath = str(tmp_path)
    ws = create_workspace(cfg)
    ws.snapshot_config(cfg)
    assert (ws.workdir / "config.ini").exists()
    reread = load_config(ws.workdir / "config.ini")
    assert reread.dataset.workspace == cfg.dataset.workspace


def test_stamp_start_end():
    cfg = Config()
    cfg.stamp_start(1_700_000_000.0)
    cfg.stamp_end(1_700_000_123.5)
    assert cfg.extra.start
    assert cfg.extra.end
    assert cfg.extra.time_elapsed == "123.500s"


def test_backend_best_accepted_and_resolved():
    """`[tpu] backend = best` parses and resolves to a concrete backend
    per model family (xla on CPU test runs — interpret-mode kernels are a
    correctness tool, not a speed path)."""
    from rawaudiovae_kelsey_tpu.config import Config
    from rawaudiovae_kelsey_tpu.models import build_model
    from rawaudiovae_kelsey_tpu.models.registry import _resolve_backend

    cfg = Config()
    cfg.tpu.backend = "best"
    cfg.validate()
    assert _resolve_backend(cfg, "dense") in ("xla", "pallas")
    assert _resolve_backend(cfg, "deep") == "xla"
    assert _resolve_backend(cfg, "conv1d") == "xla"
    build_model(cfg)  # constructs without error

    cfg.tpu.backend = "bogus"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown backend"):
        cfg.validate()


SHIPPED_CONFIGS = sorted(
    (Path(__file__).resolve().parent.parent / "configs").glob("*.ini")
)


@pytest.mark.parametrize("ini", SHIPPED_CONFIGS, ids=lambda p: p.name)
def test_shipped_configs_parse_and_validate(ini, tmp_path):
    """Every INI in configs/ must parse, substitute a real datapath, pass
    validate(), and resolve its backend — catches recipe rot when the
    config surface evolves (e.g. new [tpu] keys)."""
    from rawaudiovae_kelsey_tpu.models.registry import _resolve_backend

    text = ini.read_text()
    for ph in ("[your_dataset_path]", "[your_erokia_scale_dataset_path]"):
        text = text.replace(ph, str(tmp_path))
    p = tmp_path / ini.name
    p.write_text(text)
    cfg = load_config(p)
    cfg.validate()
    assert cfg.training.batch_size > 0
    assert _resolve_backend(cfg, cfg.vae.arch) in ("xla", "pallas")


def test_case_variant_section_rejected(tmp_path):
    """Review regression: [vae] (case variant of [VAE]) must fail loudly —
    silently routing it to cfg.unknown trains default hyperparameters."""
    p = tmp_path / "typo.ini"
    p.write_text("[vae]\nlatent_dim = 64\n")
    with pytest.raises(ValueError, match="case variant"):
        load_config(p)


def test_unreadable_config_raises(tmp_path):
    """Review regression: configparser.read() swallows OSError (e.g. a
    directory passed as --config) and returns all defaults; read_file must
    surface it."""
    with pytest.raises((OSError, IsADirectoryError)):
        load_config(tmp_path)  # a directory
