"""singa_tpu — TPU-native framework for structure-based molecular generation.

A from-scratch jax/XLA/pallas re-design with the capabilities of
Isomorpfishm/SINGA (SE(3)-equivariant protein-ligand embedding,
property-conditioned autoregressive SMILES generation, adversarial
training), built for TPU meshes. See DESIGN.md and SURVEY.md.
"""

__version__ = "0.1.0"
