""".OPTIONS card (extension): mapping onto SolverOptions, both frontends."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS


def test_options_mapping_and_parity(capsys):
    net = """\
V1 a 0 SIN 0 1 1e6
R1 a b 1k
C1 b 0 1n
.OPTIONS METHOD=TRAP GMIN=1e-9 ITL4=20 RELTOL=1e-4 VNTOL = 1e-7
.OPTIONS TEMP=85 BOGUS=3
.TRAN 1e-8 1e-7
"""
    for fe in ("python", "native"):
        sim = Simulator.from_text(net, frontend=fe)
        assert sim.opts.tran_method == "trap", fe
        assert sim.opts.tran_gmin == 1e-9, fe
        assert sim.opts.tran_max_newton_iters == 20, fe
        assert sim.opts.tran_lte_rtol == 1e-4, fe
        assert sim.opts.tran_tol == 1e-7, fe
        assert float(sim.config.temp_c) == 85.0, fe
        res = sim.transient()
        assert not bool(res.failed), fe
    assert "unknown option BOGUS" in capsys.readouterr().err


def test_options_absent_noop():
    sim = Simulator.from_text("V1 a 0 1\nR1 a 0 1k\n")
    assert sim.opts.tran_method == DEFAULT_OPTIONS.tran_method
    assert sim.opts.tran_gmin == DEFAULT_OPTIONS.tran_gmin
