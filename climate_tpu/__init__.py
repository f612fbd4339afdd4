"""climate_tpu — a TPU-native climate-emulation framework (JAX/Flax/XLA/Pallas).

Re-designed from scratch with the capabilities of the reference PyTorch stack
(ZhenmanShen/Physics-Based-Climate-Model): monthly CMIP6 forcings (CO2, SO2,
CH4, BC, rsdt) under SSP scenarios -> global tas/pr fields on a 48x72 grid.

Layers (see SURVEY.md section 7):
  data/        Zarr v2 reader (native blosc/LZ4 decode) + ETL + device-resident dataset
  transforms/  per-variable normalization as pure functions over a stats pytree
  models/      Flax model zoo (SimpleCNN, CNNTransformer, UNet, AttUNetConvLSTM)
  ops/         Pallas TPU kernels (flash attention, fused ConvLSTM gates)
  parallel/    device mesh + sharding helpers (data-parallel over ICI)
  train/       jitted train step, optax, checkpointing, logging
  eval/        on-device lat-weighted metrics, Kaggle submission + CSV metric, rollout
  config/      Hydra-compatible YAML config composition + dotted CLI overrides
  cli/         single entry point (replaces the reference's 3 main_*.py copies)
"""

__version__ = "0.1.0"
