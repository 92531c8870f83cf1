from .vocab import Vocab, nfc, read_normalized

__all__ = ['Vocab', 'nfc', 'read_normalized']
