"""Small shared utilities."""

from __future__ import annotations

import numpy as np


class HostArray:
    """Hashable wrapper for host-side numpy metadata carried in pytree aux
    (jit cache keys require hashable aux with simple equality).

    Identity-based: two separately-constructed wrappers compare unequal
    even for equal contents, which at worst costs a recompile — never a
    wrong cache hit.
    """

    __slots__ = ("a",)

    def __init__(self, a):
        self.a = None if a is None else np.asarray(a)

    def __eq__(self, other):
        return isinstance(other, HostArray) and (
            self.a is other.a
            or (self.a is None and other.a is None)
        )

    def __hash__(self):
        return id(self.a) if self.a is not None else 0

    def __repr__(self):
        return f"HostArray({None if self.a is None else self.a.shape})"
