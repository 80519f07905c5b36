"""dig_tpu — a TPU-native self-supervised scene-text-recognition framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of DiG
("Reading and Writing: Discriminative and Generative Modeling for
Self-Supervised Text Recognition", ACM MM 2022; reference implementation
is PyTorch/CUDA).  The framework covers:

* Joint contrastive (MoCo v3-style) + masked-image-modeling (SimMIM-style)
  pre-training of ViT encoders on unlabeled word images.
* Supervised fine-tuning with autoregressive transformer / GRU-attention /
  CTC decoders for scene-text recognition.
* Multi-benchmark word-accuracy evaluation with greedy and beam decoding.
* SPMD distribution over a `jax.sharding.Mesh` (data/fsdp/tensor axes),
  host-sharded input pipelines, fast native checkpointing and a native (C++)
  LMDB store compatible with the reference's on-disk dataset schema.

Design stance: functional train steps under `jax.jit` over a device mesh,
bf16 compute on the MXU, Pallas kernels for the hot attention path.
"""

__version__ = "0.1.0"
