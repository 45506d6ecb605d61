"""chap_tpu — a TPU-native (JAX / Flax / pjit / Pallas) framework with the
capabilities of gardnerzhou/CHAP: semi-supervised 2D/3D medical image
segmentation.

Layer map (mirrors reference layer map in SURVEY.md §1, rebuilt TPU-first):

    cli/        experiment launch (train_2d, train_share, test_2d, test_3d)
    train/      jitted functional train steps (CHAP, shared-encoder, supervised)
    eval/       slice-wise 2D eval + batched on-device sliding-window 3D engine
    models/     Flax model zoo + factories (DualDecoder UNet, VNet3D, ...)
    losses/     dice / masked dice / VAT power iteration / mix losses
    semi/       BCP mixing, top-k patch masks, GradSim, largest-CC NMS, memory bank
    data/       h5 readers, augmentation, two-stream batching, device prefetch
    metrics/    pure-JAX dice + host surface metrics (HD95/ASD/RAVD/JC)
    parallel/   mesh construction + sharding policy (data-parallel over ICI)
    ops/        Pallas TPU kernels for the hot paths
    utils/      config, ramps, run-dir management, logging
"""

__version__ = "0.1.0"
