"""icm_tpu — TPU-native learned image compression for machines.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference CompressAI/STF-derived codebase (``stm233/image-compression-for-
machine``): learned image codecs (GDN/window-attention CNN and Swin
transformer), hyperprior entropy models with channel-autoregressive and
zigzag context models, a native rANS entropy coder, and ICM training/eval
against frozen detection/segmentation task heads.
"""

__version__ = "0.1.0"

_entropy_coder = "ans"


def available_entropy_coders():
    return ["ans"]


def get_entropy_coder():
    return _entropy_coder


def set_entropy_coder(name: str):
    global _entropy_coder
    if name not in available_entropy_coders():
        raise ValueError(f"Unknown entropy coder {name!r}")
    _entropy_coder = name
