"""Utilities: SPICE numbers, solver options."""
