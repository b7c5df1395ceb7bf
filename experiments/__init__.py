"""Experiment scripts and retired measured-loser kernels (not part of the library)."""
