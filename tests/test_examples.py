"""Every example deck must run end-to-end through the CLI (guards the
user-facing surface: a deck in examples/ that stops parsing or crashing
an analysis is a release blocker)."""

import glob
import os

import pytest

from circuitsimulator_tpu.cli import main

DECKS = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "..", "examples", "*.sp")))


@pytest.mark.parametrize("deck", DECKS, ids=[os.path.basename(d)
                                             for d in DECKS])
def test_example_deck_runs(deck, tmp_path, capsys):
    out = tmp_path / "out.csv"
    rc = main([deck, str(out)])
    assert rc == 0
    captured = capsys.readouterr()
    assert "DC analysis finished." in captured.out
    # analysis blocks must not report failure
    assert "failed:" not in captured.err.lower()


def test_examples_exist():
    assert len(DECKS) >= 7
