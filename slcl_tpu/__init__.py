"""SLCL-TPU: a TPU-native framework for soft-labeled contrastive learning UDA.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch codebase `Dinhthixuanbinh/Soft-Labeled-Contrastive-Learning`
(MICCAI 2024, "Soft-Labeled Contrastive Learning with Reversed Monte Carlo"):
unsupervised domain adaptation for 2D cardiac MRI/CT segmentation
(MMWHS CT<->MR, MS-CMRSeg bSSFP->LGE; 4 classes: BG/MYO/LV/RV).

Design (TPU-first, not a port):
  * one functional training core: jitted ``train_step(state, batch)`` per UDA
    method instead of a trainer-class inheritance tower
  * all per-step state (segmentor + discriminator params, optimizer states,
    EMA class centroids, RNG) in one PyTree -> uniform orbax checkpointing
    and pjit sharding
  * bf16 activations / f32 accumulators; Pallas kernels for the contrastive
    hot loops (pixel x center cosine/margin/softmax, masked class reductions,
    reversed-Monte-Carlo partitioned soft centroids)
  * data parallelism over a ``jax.sharding.Mesh`` with XLA collectives,
    reserved ``('data','model')`` axes
"""

__version__ = "0.1.0"
