"""Network modules (flax)."""
