"""Driver-contract tests for __graft_entry__.py on the virtual CPU mesh."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    loss = jax.jit(fn)(*args)
    assert float(loss) >= 0.0


@pytest.mark.slow
def test_dryrun_multichip_8(capsys):
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out
    assert "4x2" in out  # dp=4, tp=2 on 8 devices


def test_dryrun_multichip_2(capsys):
    graft.dryrun_multichip(2)
    assert "2x1" in capsys.readouterr().out


def test_dryrun_too_many_devices():
    with pytest.raises(RuntimeError, match="need 64 devices"):
        graft.dryrun_multichip(64)
