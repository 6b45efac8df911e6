"""speechclip_tpu — a TPU-native (JAX/XLA/Pallas) SpeechCLIP framework.

A from-scratch rebuild of the capabilities of atosystem/SpeechCLIP
(arXiv 2210.00705) designed for TPU hardware:

- functional core: models are pytrees of parameters + pure apply functions
- static shapes everywhere (length bucketing instead of pad-to-longest)
- bf16 compute policy for the frozen towers, f32 params
- data parallelism via ``jax.sharding`` over a device mesh; contrastive
  negatives span the full global batch (XLA inserts the all-gathers)
- Pallas kernels for the hot attention ops

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from .config import ConfigNode, load_config

__all__ = ["ConfigNode", "load_config", "__version__"]
