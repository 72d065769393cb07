"""ase_tpu — a TPU-native physics-based character animation RL framework.

A from-scratch re-design (JAX / XLA / Pallas / pjit) with the capabilities of
the reference ASE system ("Adversarial Skill Embeddings for Physically
Simulated Characters", Peng et al., TOG 2022): batched articulated rigid-body
simulation, motion-capture imitation via AMP discriminators, latent skill
spaces (ASE), and hierarchical task controllers — everything designed to run
as fused on-chip computation over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
