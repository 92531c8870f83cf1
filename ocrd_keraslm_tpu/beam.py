"""Beam-search tree type.

API-equivalent to the reference ``Node``
(/root/reference/ocrd_keraslm/lib/rating.py:1240-1318): a backpointer
node with parent, char ``value``, LM ``state``, ``cum_cost``,
``extras=(element, textequiv)``, lookahead ``pro_cost`` ordering
(cum_cost + 0.5 x remaining chars), ``to_sequence(stop_at)`` and
``cut_at``.

The ``state`` here is whatever the incremental engine hands out —
a per-hypothesis tuple of (h, c) numpy arrays of shape (depth, width) —
kept opaque to this module.
"""
from __future__ import annotations

from typing import Any, List, Optional


class Node:
    """One node in a tree of textual alternatives for beam search."""

    __slots__ = ('value', 'parent', 'state', 'cum_cost', 'length',
                 'extras', '_sequence')

    def __init__(self, state: Any, value: str, cost: float,
                 parent: Optional['Node'] = None, extras: Any = None):
        self.value = value
        self.parent = parent
        self.state = state
        self.cum_cost = (parent.cum_cost + cost) if parent else cost
        self.length = 1 if parent is None else parent.length + 1
        self.extras = extras
        self._sequence: Optional[List['Node']] = None

    def to_sequence(self, stop_at=None) -> List['Node']:
        """Return the node sequence from root (or ``stop_at`` member,
        inclusive) to this node."""
        if not self._sequence:
            self._sequence = []
            current = self
            activated = not stop_at
            while current:
                if stop_at and current in stop_at:
                    activated = True
                if activated:
                    self._sequence.insert(0, current)
                current = current.parent
        return self._sequence

    def cut_at(self, node: 'Node') -> None:
        """Replace ``node`` as ancestor parent by None (detach tail)."""
        current = self
        while current:
            if current.parent is node:
                current.parent = None
                self._sequence = None
                break
            current = current.parent

    def pro_cost(self) -> float:
        """Prospective cost: cumulative + 0.5 bits per remaining char of
        the current alternative (admissible-ish lookahead)."""
        if self.extras:
            remaining = len(self.extras[1].Unicode) - len(self.value)
        else:
            remaining = 0
        return self.cum_cost + 0.5 * remaining

    # ordering by pro_cost (used by insort in all beam maintenance)
    def __lt__(self, other):
        return self.pro_cost() < other.pro_cost()

    def __le__(self, other):
        return self.pro_cost() <= other.pro_cost()

    def __gt__(self, other):
        return self.pro_cost() > other.pro_cost()

    def __ge__(self, other):
        return self.pro_cost() >= other.pro_cost()
