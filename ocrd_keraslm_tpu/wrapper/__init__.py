"""OCR-D processor wrapper (standalone PAGE-XML/METS backend).

KerasRate - the ocrd-keraslm-rate processor
"""
from .rate import KerasRate

__all__ = ['KerasRate']
