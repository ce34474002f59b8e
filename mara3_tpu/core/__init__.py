"""Core containers & numerics (maps reference layer 1, src/core_*.hpp)."""
