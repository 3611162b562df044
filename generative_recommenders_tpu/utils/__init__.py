"""Utilities: Orbax checkpointing, profiling, TB logging, SL/bucketing."""
