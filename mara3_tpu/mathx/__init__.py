"""Math helpers (maps reference layer 5, src/math_*.hpp, post_shock_locator.hpp)."""
