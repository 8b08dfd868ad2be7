"""Packaging metadata stays consistent with the library.

The reference ships no packaging at all (16 flat files); a standalone
framework must be installable, so pyproject.toml + the console script are
part of the surface.  A real `pip install --no-deps --target` of the repo was
exercised when this landed; these tests pin the cheap invariants so drift
(version skew, a renamed entry point, a dropped hard dep) fails fast.
"""

from __future__ import annotations

try:
    import tomllib  # stdlib on 3.11+
except ImportError:  # pragma: no cover - 3.10 fallback
    import tomli as tomllib  # type: ignore[no-redef]
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_pyproject_parses_and_version_matches():
    meta = _load()
    import rawaudiovae_kelsey_tpu as pkg

    assert meta["project"]["version"] == pkg.__version__
    assert meta["project"]["name"] == "rawaudiovae-kelsey-tpu"


def test_console_script_target_resolves():
    meta = _load()
    target = meta["project"]["scripts"]["rawaudiovae-tpu"]
    mod_name, func_name = target.split(":")
    import importlib

    mod = importlib.import_module(mod_name)
    assert callable(getattr(mod, func_name))


def test_hard_deps_are_the_imported_ones():
    # jax/numpy/optax are the only top-level third-party imports in the
    # package (orbax is lazy, torch lives in compat/ + tests); the dependency
    # list must name exactly those three.
    meta = _load()
    names = {d.split(">=")[0].split("==")[0].strip()
             for d in meta["project"]["dependencies"]}
    assert names == {"jax", "numpy", "optax"}


def test_py_typed_marker_ships():
    assert (REPO / "rawaudiovae_kelsey_tpu" / "py.typed").exists()


def test_cli_example_commands_fail_cleanly_when_examples_absent(
        monkeypatch, capsys):
    # Installed wheels don't ship examples/: the tutorial/export commands
    # must exit 2 with a pointer, not crash in runpy.
    import sys

    import pytest

    from rawaudiovae_kelsey_tpu import __main__ as cli

    monkeypatch.setattr(cli, "_example_script",
                        lambda cmd: Path("/nonexistent/examples/t.py"))
    monkeypatch.setattr(sys, "argv", ["rawaudiovae-tpu", "tutorial"])
    with pytest.raises(SystemExit) as e:
        cli.main()
    assert e.value.code == 2
    assert "source checkout" in capsys.readouterr().err


def test_cli_example_commands_resolve_in_repo():
    from rawaudiovae_kelsey_tpu.__main__ import _example_script

    for cmd in ("tutorial", "export"):
        assert _example_script(cmd).exists()
