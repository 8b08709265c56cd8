"""seervideoldm_tpu — a TPU-native JAX/XLA/Pallas framework for
language-instructed video prediction with latent diffusion models.

Re-implements the full capability surface of SeerVideoLDM (ICLR 2024,
arXiv 2303.14897) as an idiomatic TPU-first framework:

- ``models``    — SeerUNet (inflated 3D UNet), FSText decomposer, VAE, CLIP text
- ``ops``       — attention (einsum + Pallas flash kernels), norms, rotary, windows
- ``diffusion`` — beta/ᾱ schedules, DDPM training ops, lax.scan DDIM sampler
- ``data``      — Sthv2 / BridgeData / EpicKitchens datasets + prefetch loader
- ``evaluation``— I3D FVD/KVD, C3D inception score
- ``parallel``  — device meshes, sharding rules, collectives
- ``io``        — torch→JAX weight conversion, Orbax checkpointing
- ``pipelines`` — end-to-end text+frames → video sampling
- ``training``  — optax train state, partial freezing, metrics

Design stance: channels-last activations ``(b, f, h, w, c)``, bf16 compute
with fp32 norm/softmax islands, everything jitted with static shapes, data
parallelism over a ``jax.sharding.Mesh`` (with optional tensor-parallel
sharding of attention/FFN weights).
"""

__version__ = "0.1.0"
