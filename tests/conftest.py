"""Test configuration: force CPU + float64 so CI needs no TPU and parity
tests compare apples-to-apples with the C++ double-precision reference.
A virtual 8-device mesh backs the multi-chip sharding tests."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The deployment environment pins JAX_PLATFORMS=axon via a site hook, so the
# env var alone is not enough — set the config explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402
import pathlib  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pytest  # noqa: E402

# ---- smoke tier -----------------------------------------------------
# `pytest -m smoke` = the <10-min CI slice: reference-parity goldens +
# at least one test file per analysis/subsystem.  Whole files are
# marked here (pytest_collection_modifyitems) so the list stays in one
# place; everything else is the nightly/full tier (60-95 min on 1 CPU).
SMOKE_FILES = {
    # reference parity (goldens, both frontends, numbers/lexer/parser)
    "test_dc.py", "test_numbers.py", "test_lexer.py", "test_parser.py",
    "test_examples.py", "test_native_frontend.py",
    # one representative per analysis / subsystem
    "test_transient.py", "test_ac_sweep.py", "test_hb.py",
    "test_noise.py", "test_pac.py", "test_sensitivity.py",
    "test_measure.py", "test_fourier.py", "test_dc_sweep2.py",
    "test_lu.py", "test_woodbury.py", "test_parallel.py",
    "test_spike.py", "test_waveforms.py", "test_bsource.py",
    "test_options_card.py", "test_rawfile.py", "test_sstate.py",
    # ABSOLUTE anchors two independently-implemented paths must agree
    # on — consistency tests (envelope-vs-HB etc.) cannot catch a term
    # dropped from BOTH sides; this one caught the r3 T-line-delay
    # regression the rest of the smoke tier missed
    "test_hb_tline.py",
    # r4 session-3 surfaces: the pac/pxf/pnoise adjoint trio + 2-port
    # stability metrics (fast closed-form anchors)
    "test_pxf.py", "test_stability2p.py",
}
# test_hb_krylov.py marks its two fast dense-vs-gmres parity tests
# @pytest.mark.smoke in-file (the full file is ~5 min)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.path is not None and item.path.name in SMOKE_FILES:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session")
def goldens_dir():
    return pathlib.Path(__file__).resolve().parent / "goldens"
