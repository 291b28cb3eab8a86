"""HO-NeRF-TPU: a TPU-native (JAX/XLA/Pallas) framework for neural-SDF
hand-object reconstruction and pose fitting.

Re-designed from scratch with the capabilities of the HO-NeRF reference
(iscas3dv/HO-NeRF, ICCV 2023): offline NeuS-style SDF training for hand and
object models, HALO keypoint-to-bone hand articulation, and online
single-frame / video pose fitting with render, interaction, smoothness and
stability losses — implemented as pure-functional JAX with explicit PRNG
keys, pytree parameters, fused Pallas kernels on the hot ray-marching path
and `shard_map` data parallelism over rays/views/frames.

Package layout (see SURVEY.md §7):
  config/   HOCON-compatible config loader with CASE_NAME templating
  utils/    rotations, SE(3), PLY IO, logging helpers
  camera/   NDC perspective cameras, ray bundles (replaces pytorch3d)
  hand/     skeleton conversions + HALO pose converter (kinematics)
  models/   positional encodings, SDF/color/deviation MLPs, VGG features
  render/   hierarchical SDF sampling, NeuS compositing (single + dual)
  ops/      Pallas TPU kernels for the fused field-evaluation hot path
  parallel/ device mesh + sharding helpers (rays/views/frames DP)
  data/     dataset manifests, pixel/ray samplers, synthetic fixtures
  train/    offline training loop (optax/orbax), LR schedules, checkpoints
  fit/      online single-frame and video pose fitters
  extract/  grid SDF evaluation + marching cubes (C++ host extension)
  eval/     pose / interaction / temporal / image-quality metric suites
  cli/      exp_runner / fitting_single / fitting_video / get_res CLIs
"""

__version__ = "0.1.0"
