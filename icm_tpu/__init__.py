"""icm_tpu — TPU-native learned image compression for machines.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference CompressAI/STF-derived codebase (``stm233/image-compression-for-
machine``): learned image codecs (GDN/window-attention CNN and Swin
transformer), hyperprior entropy models with channel-autoregressive and
zigzag context models, a native rANS entropy coder, and ICM training/eval
against frozen detection/segmentation task heads.
"""

__version__ = "0.2.0"

_CODER_ALIASES = {"ans": "rans"}  # reference drop-in name (its rANS is "ans")


def available_entropy_coders():
    """Selectable coder backends (reference surface:
    ``compressai/__init__.py:22-62``): the native C++ rANS ("rans",
    reference-compatible alias "ans") and the byte-identical pure-Python
    model ("rans-py")."""
    from . import coding

    names = list(coding.available_entropy_coders())
    if "rans" in names:
        names.insert(0, "ans")
    return names


def get_entropy_coder():
    from . import coding

    return coding.get_entropy_coder()


def set_entropy_coder(name: str):
    from . import coding

    coding.set_entropy_coder(_CODER_ALIASES.get(name, name))
