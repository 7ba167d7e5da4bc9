"""gill_tpu: a TPU-native (JAX/XLA/Pallas/pjit) multimodal framework.

Re-implements the full capability surface of GILL ("Generating Images with
Multimodal Language Models", NeurIPS 2023; reference implementation
kohjingyu/gill) as a from-scratch TPU-first design:

  * frozen OPT decoder + frozen CLIP ViT encoder glued by small trainable
    adapters (visual projection, [IMG0..7] token rows, retrieval head,
    GILLMapper generation head)          -> gill_tpu.models.gill
  * 3-mode multi-task training step (captioning / retrieval / generation)
    as one pjit-compiled SPMD program    -> gill_tpu.train
  * KV-cached lax.scan decoding with [IMG] logic and on-device top-p
                                         -> gill_tpu.models.gill / ops.sampling
  * Stable Diffusion v1.5 (UNet/VAE/CLIP-text/PNDM+DDIM) for novel image
    generation                           -> gill_tpu.models.sd
  * CC3M retrieval over an HBM-resident sharded index with on-device top-k
                                         -> gill_tpu.retrieval
  * Pallas TPU kernels for the attention hot path -> gill_tpu.ops.attention

The public inference API (`GILL.generate_for_images_and_texts`) is
interface-compatible with the reference (gill/models.py:582).
"""

__version__ = "0.1.0"

from gill_tpu.config import GILLConfig  # noqa: F401
