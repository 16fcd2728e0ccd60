"""magicdance_tpu — TPU-native framework for pose/expression retargeting.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MagicDance/MagicPose (reference: Boese0601/MagicDance): an SD1.5 latent
diffusion core, an appearance-control branch whose reference-image attention
states form a functional "bank" pytree fused into the main UNet's
self-attention, an OpenPose ControlNet residual branch, AnimateDiff-style
temporal motion modules, and a DDIM CFG sampler compiled to a single
`lax.scan` — all designed TPU-first (SPMD meshes, static shapes, Pallas
kernels for the custom attention shapes).
"""

__version__ = "0.1.0"
