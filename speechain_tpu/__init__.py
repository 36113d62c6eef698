"""SpeeChain-TPU: a TPU-native machine speech chain framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the SpeeChain
toolkit (reference: bagustris/speechain): ASR (Transformer/Conformer attention
encoder-decoder with CTC and joint beam search), TTS (Transformer-TTS and
FastSpeech2), language models, the offline TTS->ASR semi-supervised chain,
on-the-fly log-Mel frontends, SpecAugment, synchronized feature normalization,
length-bucketed multi-stream data loading, and the full train/test runtime.

Design: everything on the device side is functional JAX -- jitted train and
inference steps over a ``jax.sharding.Mesh`` with explicit partitioning;
hot kernels (fused log-Mel frontend, attention) have Pallas TPU variants;
host-side runtime (data pipeline, monitor, checkpointing) is plain Python
with optional C++ acceleration.
"""

__version__ = "0.1.0"
