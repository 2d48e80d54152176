"""Flat-array circuit IR + lowering."""
