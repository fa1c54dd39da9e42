"""Engines: NumPy golden oracle and the TPU engine/pipeline."""
