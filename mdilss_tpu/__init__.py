"""mdilss_tpu — TPU-native multi-domain incremental learning for semantic segmentation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch research code (prachigarg23/MDIL-SS, WACV 2022, arXiv:2110.12205):
ERFNet-based segmentation trained incrementally across driving-scene domains
(Cityscapes -> BDD100k -> IDD) with Residual Adapter Parallel (RAP) 1x1 convs,
domain-specific BatchNorm, per-domain decoders, and KL-distillation against the
frozen previous-step model.

Design (TPU-first, not a port):
  * NHWC layout everywhere; weights HWIO; bf16 compute / f32 params optional.
  * Pure-functional models: params/state are plain pytrees; `apply` fns are
    jit-friendly with static task indices (<=3 compiled variants, no retraces).
  * Domain-specific parameters carry a leading task axis [T, ...] so that
    incremental "checkpoint surgery" is a pytree op, not key-string rewriting.
  * One jitted train step per protocol step (teacher + student co-located under
    the same jit; no host hops, unlike the reference's GPU3->CPU->GPU0 ship).
  * Data parallelism via jax.sharding.Mesh + NamedSharding; XLA inserts the
    gradient all-reduce over ICI.
  * Hot ops (fused non-bottleneck-1d) get Pallas TPU kernels; lax.conv is the
    always-available correctness path.
"""

__version__ = "0.1.0"
