"""Extra golden parity cases minted by differential fuzzing against the
reference binary (benchmarks/fuzz_parity.py): random R/C/L/V/I/MOS circuits
whose DC tables and transient CSVs the reference produced — including the
caseL* family with 500-1500-step transients.  The transient bar is print
precision: the CSVs carry 9 significant digits (%.9e, tanalisis.cpp:229),
so column-relative quantization is ~5e-10; measured engine-vs-reference
error across the corpus is <= ~2e-10 rel and the assert pins 2e-9."""

import glob
import os

import numpy as np
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.io.csvout import read_csv
from circuitsimulator_tpu.io.table import parse_dc_table

FUZZ_DIR = os.path.join(os.path.dirname(__file__), "goldens", "fuzz")
CASES = sorted(os.path.basename(p)[:-3]
               for p in glob.glob(os.path.join(FUZZ_DIR, "*.sp")))


@pytest.mark.parametrize("case", CASES)
def test_fuzz_golden(case, tmp_path):
    sim = Simulator.from_file(os.path.join(FUZZ_DIR, f"{case}.sp"))
    x = np.asarray(sim.dc())

    ref_volts, ref_amps = parse_dc_table(
        open(os.path.join(FUZZ_DIR, f"{case}_dc.txt")).read())
    my_volts, my_amps = parse_dc_table(sim.dc_report(x))
    for name, v in ref_volts.items():
        assert my_volts[name] == pytest.approx(v, abs=2e-6), f"V({name})"
    for name, v in ref_amps.items():
        assert my_amps[name] == pytest.approx(v, abs=2e-6), f"I({name})"

    res = sim.transient()
    assert not bool(res.failed)
    out = tmp_path / "t.csv"
    sim.write_transient_csv(str(out), res)
    h_ref, d_ref = read_csv(os.path.join(FUZZ_DIR, f"{case}_tran.csv"))
    h_my, d_my = read_csv(str(out))
    assert h_ref == h_my
    assert d_ref.shape == d_my.shape
    scale = np.maximum(np.abs(d_ref).max(axis=0), 1e-9)
    rel = (np.abs(d_ref - d_my).max(axis=0) / scale).max()
    assert rel < 2e-9, rel
