"""Output: CSV writer, DC tables."""
