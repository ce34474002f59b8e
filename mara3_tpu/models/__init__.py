"""Semi-analytic models (maps reference layer 7, src/model_*.hpp)."""
