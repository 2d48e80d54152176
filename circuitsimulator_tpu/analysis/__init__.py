"""Analyses: DC, transient, AC, DC sweep, steady state."""
