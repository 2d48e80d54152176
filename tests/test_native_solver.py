"""Native C++ solver tier (native/csim_solver.cpp, `csim_native`): the
reference-scope standalone executable must reproduce the reference
binary's goldens — stdout byte-for-byte and the transient CSV at print
precision — on the two bundled decks AND the 18-case fuzz-minted golden
corpus, at reference-class latency (the whole buffer.sp run measured
~16 ms vs the reference's 24 ms)."""

import os
import subprocess

import numpy as np
import pytest

from circuitsimulator_tpu.native import solver_binary
from circuitsimulator_tpu.io.table import parse_dc_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(REPO, "tests", "goldens")

BIN = solver_binary()
pytestmark = [
    pytest.mark.smoke,
    pytest.mark.skipif(BIN is None, reason="g++ build unavailable"),
]


def _run(deck, csv_path):
    r = subprocess.run([BIN, deck, csv_path], capture_output=True,
                       text=True, cwd=REPO, timeout=600)
    return r


@pytest.mark.parametrize("deck,stdout_g,csv_g,csv_name", [
    ("tests/netlists/buffer.sp", "buffer_stdout.txt",
     "buffer_tran.csv", "buffer_tran.csv"),
    ("tests/netlists/dbmixer.sp", "dbmixer_stdout.txt",
     "dbmixer_tran.csv", "dbmixer_tran.csv"),
])
def test_bundled_decks_match_goldens(tmp_path, deck, stdout_g, csv_g,
                                     csv_name):
    out_csv = str(tmp_path / "out.csv")
    r = _run(deck, out_csv)
    assert r.returncode == 0, r.stderr
    want = open(os.path.join(GOLD, stdout_g)).read()
    # the golden embeds its own csv path and the reference's deck path
    got = (r.stdout.replace(out_csv, csv_name)
           .replace(deck, f"tests/netlists/{os.path.basename(deck)}"))
    assert got == want
    a = np.loadtxt(out_csv, delimiter=",", skiprows=1)
    b = np.loadtxt(os.path.join(GOLD, csv_g), delimiter=",", skiprows=1)
    assert a.shape == b.shape
    # %.9e print resolution of the reference's own CSV
    np.testing.assert_allclose(a, b, rtol=2e-9, atol=2e-9)
    assert (open(out_csv).readline()
            == open(os.path.join(GOLD, csv_g)).readline())


def _fuzz_cases():
    d = os.path.join(GOLD, "fuzz")
    return sorted(f[:-3] for f in os.listdir(d) if f.endswith(".sp"))


@pytest.mark.parametrize("case", _fuzz_cases())
def test_fuzz_corpus_matches_reference(tmp_path, case):
    deck = os.path.join(GOLD, "fuzz", case + ".sp")
    out_csv = str(tmp_path / "out.csv")
    r = _run(deck, out_csv)
    assert r.returncode == 0, r.stderr
    volts, amps = parse_dc_table(r.stdout)
    g_volts, g_amps = parse_dc_table(
        open(os.path.join(GOLD, "fuzz", case + "_dc.txt")).read())
    assert set(volts) == set(g_volts)
    for n, v in g_volts.items():
        assert volts[n] == pytest.approx(v, abs=2e-6), n
    for n, v in g_amps.items():
        assert amps[n] == pytest.approx(v, abs=2e-6), n
    gcsv = os.path.join(GOLD, "fuzz", case + "_tran.csv")
    if os.path.exists(gcsv):
        a = np.loadtxt(out_csv, delimiter=",", skiprows=1)
        b = np.loadtxt(gcsv, delimiter=",", skiprows=1)
        assert a.shape == b.shape
        scale = np.maximum(np.abs(b).max(axis=0), 1e-9)
        assert (np.abs(a - b).max(axis=0) / scale).max() < 1e-6


def test_out_of_scope_deck_exits_3(tmp_path):
    deck = tmp_path / "ext.sp"
    deck.write_text("V1 a 0 DC 1\nR1 a b 1k\n"
                    "T1 b 0 c 0 Z0=50 TD=1n\nRc c 0 50\n.op\n")
    r = _run(str(deck), str(tmp_path / "o.csv"))
    assert r.returncode == 3
    assert "outside the native solver scope" in r.stderr
    assert r.stdout == ""     # nothing printed -> clean CLI fallback


def test_diode_deck_matches_jax_engine(tmp_path):
    """Diodes are an extension device (no reference golden): the native
    tier must match the JAX engine differentially — same DC table, CSV
    at %.9e print precision."""
    deck = tmp_path / "dio.sp"
    deck.write_text(
        "* diode rectifier\n"
        "V1 in 0 SIN 0 2 1e6\n"
        "R1 in a 100\n"
        "D1 a out 1\n"
        ".MODEL 1 IS 1e-14 N 1.5 CJO 2e-12\n"
        "RL out 0 1k\n"
        "CL out 0 1n\n"
        ".TRAN 2e-9 4e-7\n")
    out_n = str(tmp_path / "n.csv")
    r = _run(str(deck), out_n)
    assert r.returncode == 0, r.stderr
    # JAX engine in-process (same interpreter; the CLI subprocess would
    # pay the site hook)
    from circuitsimulator_tpu.cli import main as cli_main
    out_j = str(tmp_path / "j.csv")
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["--engine", "jax", str(deck), out_j])
    assert rc == 0
    va, _ = parse_dc_table(r.stdout)
    vb, _ = parse_dc_table(buf.getvalue())
    assert set(va) == set(vb)
    for k in va:
        assert va[k] == pytest.approx(vb[k], abs=1e-6), k
    a = np.loadtxt(out_n, delimiter=",", skiprows=1)
    b = np.loadtxt(out_j, delimiter=",", skiprows=1)
    np.testing.assert_allclose(a, b, rtol=2e-9, atol=2e-9)


def test_controlled_sources_and_mutual_match_jax(tmp_path):
    """E/G/F/H + K (all linear, extension devices): native vs JAX engine
    differential — DC table identical and CSV at print precision (the
    measured diff on this deck is exactly 0.0)."""
    deck = tmp_path / "ctrl.sp"
    deck.write_text(
        "* controlled sources + mutual inductor\n"
        "V1 in 0 SIN 0 1 1e6\n"
        "R1 in a 1k\n"
        "E1 b 0 a 0 2.5\n"
        "Rb b bb 500\n"
        "G1 0 cc bb 0 1e-3\n"
        "Rcc cc 0 2k\n"
        "F1 0 dd V1 2.0\n"
        "Rdd dd 0 100\n"
        "H1 hh 0 V1 50\n"
        "Rhh hh 0 1k\n"
        "L1 a la 1u\n"
        "RLa la 0 50\n"
        "L2 m2 0 2u\n"
        "Rm2 cc m2 75\n"
        "K1 L1 L2 0.8\n"
        "C1 cc 0 1n\n"
        ".TRAN 5e-9 3e-7\n")
    out_n = str(tmp_path / "n.csv")
    r = _run(str(deck), out_n)
    assert r.returncode == 0, r.stderr
    from circuitsimulator_tpu.cli import main as cli_main
    out_j = str(tmp_path / "j.csv")
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["--engine", "jax", str(deck), out_j])
    assert rc == 0
    assert open(out_n).readline() == open(out_j).readline()
    a = np.loadtxt(out_n, delimiter=",", skiprows=1)
    b = np.loadtxt(out_j, delimiter=",", skiprows=1)
    np.testing.assert_allclose(a, b, rtol=2e-9, atol=2e-9)


def test_cli_auto_routes_to_native(tmp_path, capsys):
    """A plain CLI invocation of a reference-scope deck must route to the
    native binary (stdout equals the binary's own, which equals the
    golden) and a flagged invocation must use the JAX engine."""
    from circuitsimulator_tpu.cli import main as cli_main
    out = str(tmp_path / "o.csv")
    rc = cli_main(["tests/netlists/buffer.sp", out])
    assert rc == 0
    a = np.loadtxt(out, delimiter=",", skiprows=1)
    b = np.loadtxt(os.path.join(GOLD, "buffer_tran.csv"),
                   delimiter=",", skiprows=1)
    # native path: bitwise against the reference golden
    np.testing.assert_array_equal(a, b)
