"""Unit tests for SPICE number parsing (reference: include/utils.hpp:20-74)."""

import math

import pytest

from circuitsimulator_tpu.utils.numbers import parse_spice_number, is_ground_name


@pytest.mark.parametrize("tok,val", [
    ("10", 10.0),
    ("10k", 10e3),
    ("1u", 1e-6),
    ("3e12", 3e12),
    ("-1.2e-3", -1.2e-3),
    ("3.3meg", 3.3e6),
    ("4.0e-14", 4e-14),
    ("0.35e-6", 0.35e-6),
    (".25e-6", 0.25e-6),
    ("1f", 1e-15),
    ("2p", 2e-12),
    ("5n", 5e-9),
    ("7m", 7e-3),
    ("9g", 9e9),
    ("11t", 11e12),
    ("1MEG", 1e6),
    ("100e-9", 100e-9),
    ("1e-2", 1e-2),
    # unknown suffix -> factor 1 (utils.hpp:43)
    ("5x", 5.0),
    ("1e3k", 1e6),     # stod eats "1e3", suffix "k"
    ("1e", 1.0),       # incomplete exponent: stod consumes "1", suffix "e" unknown
    ("900e6", 900e6),
])
def test_parse(tok, val):
    assert parse_spice_number(tok) == pytest.approx(val, rel=0, abs=0)


def test_no_number_no_alpha_returns_zero():
    assert parse_spice_number("...") == 0.0
    assert parse_spice_number("+-") == 0.0


def test_unparseable_raises():
    with pytest.raises(ValueError):
        parse_spice_number("foo")
    with pytest.raises(ValueError):
        parse_spice_number("+k")


def test_ground_names():
    assert is_ground_name("0")
    assert is_ground_name("gnd")
    assert is_ground_name("GND")
    assert not is_ground_name("00")
    assert not is_ground_name("ground")
