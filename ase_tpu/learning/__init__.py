"""Learning layer: PPO/AMP/ASE/HRL agents, buffers, normalizers."""
