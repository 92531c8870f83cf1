"""ocrd_keraslm_tpu — TPU-native character-level LSTM language modelling.

A brand-new JAX/XLA/Pallas framework with the capabilities of
OCR-D/ocrd_keraslm: training, evaluation, scoring, generation and
best-path lattice decoding with a char-level stacked-LSTM LM
(char + metadata-context embeddings, weight-tied softmax), h5-compatible
checkpoints, a ``keraslm-rate`` CLI and an ``ocrd-keraslm-rate``
processor.
"""
__version__ = '0.5.0'

from .beam import Node
from .rater import Rater

__all__ = ['Rater', 'Node', '__version__']
