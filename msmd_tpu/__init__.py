"""msmd_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
speech-driven 3D facial animation with style control.

Provides the full capability surface of the "Model See Model Do" (MSMD)
reference stack (ubisoft/ubisoft-laforge-msmd), re-designed TPU-first:

- conditional diffusion transformer motion decoder with classifier-free
  guidance and the full denoising loop staged on-device as a ``lax.scan``
  (reference: model.py)
- VAE style encoders (reference: style_encoder.py)
- wav2vec2 / HuBERT audio encoders as jit-compiled Flax modules with the
  frame-rate resampling head (reference: utils/wav2vec2.py, utils/hubert.py)
- FLAME linear-blend-skinning vertex decoding as a fused XLA program
  (reference: utils/flame.py, utils/lbs.py)
- windowed autoregressive long-form inference (reference: inference.py)
- data-parallel training over an ICI device mesh (new; the reference is
  single-GPU)
"""

__version__ = "0.1.0"

from msmd_tpu.config import MSMDConfig  # noqa: F401
