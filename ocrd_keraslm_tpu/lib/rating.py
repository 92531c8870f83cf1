"""Reference-compat alias module (``ocrd_keraslm.lib.rating`` path)."""
from ..beam import Node
from ..rater import Rater

__all__ = ['Rater', 'Node']
