"""Runtime enable/disable toggles (reference core/utils/enable_mixin.py:4-38)."""
from __future__ import annotations

from functools import wraps


class EnableMixin:
    """Adds .enable()/.disable() plus the ``enabled`` property."""

    @property
    def enabled(self) -> bool:
        return not getattr(self, "_disabled", False)

    def enable(self):
        self._disabled = False

    def disable(self):
        self._disabled = True


def if_enabled(method):
    """Guard a method so it is a no-op when the object is disabled."""

    @wraps(method)
    def wrapper(self, *args, **kwargs):
        if getattr(self, "_disabled", False):
            return None
        return method(self, *args, **kwargs)

    return wrapper
