"""catre_tpu: a TPU-native (JAX/XLA/Pallas) category-level 6D pose + scale
refinement framework with the capabilities of THU-DA-6D-Pose-Group/CATRE.

Architecture (TPU-first, not a port):
  - geom/     pure-jax batched geometry (rotations, transforms, symmetry, errors)
  - models/   flax modules: shared PointNet encoder, disentangled delta heads,
              pose/scale composition
  - ops/      device-side point sampling (ball-crop, FPS) + pallas kernels
  - losses/   point-matching / rotation / translation / scale losses
  - solver/   optax Ranger (RAdam+Lookahead+GC) + flat_and_anneal schedule
  - data/     NOCS / CAMERA dataset readers, metadata, batching, augmentation
  - engine/   jitted refine loop (lax.scan), train/test loops
  - eval/     NOCS fixed-IoU mAP protocol
  - parallel/ jax.sharding mesh helpers (data-parallel over instances)
  - utils/    checkpointing (orbax + torch converter), events, logging
"""

__version__ = "0.1.0"
