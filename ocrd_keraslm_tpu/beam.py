"""Reference-compat beam-search node type.

The reference exports a ``Node`` backpointer type as part of its
public API (/root/reference/ocrd_keraslm/lib/rating.py:1240-1318 via
lib/__init__.py), so downstream code constructing or walking beam
trees keeps working against this package.  Internally this framework
does NOT use it: the device engines keep the beam in fixed-shape
arrays (ops/beam_device.py), and the host engines use per-edge
``PathStep``/``Hypothesis`` records (host_beam.py).  This class exists
purely for API compatibility.

Contract (matching the reference semantics): ``cum_cost`` accumulates
parent cost + own cost; ordering is by prospective cost = ``cum_cost``
plus half a bit per not-yet-consumed char of the current alternative
(``extras[1]``); ``to_sequence(stop_at)`` lists the lineage root-first
UP TO the nearest ancestor found in ``stop_at`` (i.e. the part of the
path before the previous beam; the whole lineage down to self when
``stop_at`` is empty, and [] when self does not derive from any
``stop_at`` node); ``cut_at(node)`` makes the child of ``node`` a
root.
"""
from __future__ import annotations

from functools import total_ordering
from typing import Any, Iterator, List, Optional


@total_ordering
class Node:
    """One node in a tree of textual alternatives for beam search."""

    __slots__ = ('value', 'parent', 'state', 'cum_cost', 'length',
                 'extras', '_sequence')

    def __init__(self, state: Any, value: str, cost: float,
                 parent: Optional['Node'] = None, extras: Any = None):
        self.parent = parent
        self.value = value
        self.state = state
        self.extras = extras
        if parent is None:
            self.cum_cost = cost
            self.length = 1
        else:
            self.cum_cost = parent.cum_cost + cost
            self.length = parent.length + 1
        self._sequence: Optional[List['Node']] = None

    def _lineage(self) -> Iterator['Node']:
        """Self and all ancestors, leaf-first."""
        node: Optional['Node'] = self
        while node is not None:
            yield node
            node = node.parent

    def to_sequence(self, stop_at=None) -> List['Node']:
        """With ``stop_at``: the lineage from the root down to (and
        including) the nearest ancestor that is a ``stop_at`` member,
        or [] if none is.  Without: the full root-to-self lineage."""
        if stop_at:
            lineage = list(self._lineage())
            for i, node in enumerate(lineage):
                if node in stop_at:
                    before = lineage[i:]  # crossing .. root
                    before.reverse()
                    return before
            return []  # does not derive from any stop_at node
        if self._sequence is None:
            collected = list(self._lineage())
            collected.reverse()
            self._sequence = collected
        return self._sequence

    def cut_at(self, node: 'Node') -> None:
        """Detach the subtree: the child of ``node`` on this lineage
        becomes a root."""
        for member in self._lineage():
            if member.parent is node:
                member.parent = None
                self._sequence = None
                return

    def pro_cost(self) -> float:
        """Prospective cost: cumulative cost plus a 0.5-bit lookahead
        per remaining char of the current alternative."""
        if not self.extras:
            return self.cum_cost
        outstanding = len(self.extras[1].Unicode) - len(self.value)
        return self.cum_cost + 0.5 * outstanding

    def __lt__(self, other: 'Node') -> bool:
        return self.pro_cost() < other.pro_cost()

    def __eq__(self, other) -> bool:
        return self is other

    def __hash__(self):
        return id(self)
