"""pcfm — TPU-native point-cloud flow matching.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
ruanjinchen/Point-Cloud-Flow-Matching (PyTorch + CUDA reference):
conditional RGB point-cloud generation on articulated objects via
rectified-flow matching.

Layout:
  pcfm.ops       point-cloud primitives (voxelize, devoxelize, chamfer, EMD,
                 FPS, ball query, grouping, 3-NN interpolation) as pure-JAX
                 ops plus Pallas TPU kernels for the hot ones
  pcfm.nn        flax building blocks (SharedMLP, SE3d, PVConv, FiLM, norms)
  pcfm.models    model zoo (ShapeEncoder, VelocityNet, ContextNet, HybridMLP,
                 ConditionalLatentVelocityNet, CondAdversary)
  pcfm.data      H5 shard datasets, condition encoders, PLY IO, packer
  pcfm.train     train state, jitted train step, checkpointing, CLI
  pcfm.sample    jitted lax.scan ODE integrators (Euler/midpoint/Heun/RK4)
  pcfm.eval      CD / EMD / F-score evaluation
  pcfm.parallel  device mesh + sharding helpers (dp over batch, sp over points)
  pcfm.utils     seeding, PLY/XYZ writers, metric helpers
"""

__version__ = "0.1.0"
