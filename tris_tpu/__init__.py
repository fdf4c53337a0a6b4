"""TRIS-TPU: a TPU-native framework for weakly-supervised referring image segmentation.

Re-designed from scratch for JAX/XLA/Pallas with the capabilities of the
reference TRIS codebase (ICCV 2023, arXiv:2308.14575).
"""

__version__ = "0.1.0"
