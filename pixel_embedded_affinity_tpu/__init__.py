"""pixel_embedded_affinity_tpu — TPU-native framework for pixel-embedded affinity
instance segmentation.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of
weih527/Pixel-Embedded-Affinity (AAAI-22): CNNs predict per-pixel embedding
vectors; affinities between offset-shifted pixel pairs are cosine similarities
of their L2-normalized embeddings; graph post-processing (mutex watershed /
agglomeration / multicut) decodes instances.

Layout (one shared framework, not per-dataset copies):
  ops/       offset geometry, GT affinity transforms, embedding->affinity
             (jnp oracle + fused Pallas TPU kernel), losses
  models/    Flax models (ResUNet2D family, UNet_PNI 3D, UNet3D MALA)
  data/      dataset providers, augmentation, EMA-consistency views
  parallel/  device meshes, sharded train step, tiled inference engine
  postproc/  host-side instance decoding (C++ mutex watershed, agglomeration,
             multicut, small-object merging)
  metrics/   SBD/DiC, VOI/ARAND, AJI/F1/PQ
  train/     training loop, optimizer, checkpointing, torch ckpt conversion
  infer/     2D/3D inference drivers
"""

__version__ = "0.1.0"
