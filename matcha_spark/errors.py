"""Typed query-validation errors.

Mirrors the reference's ``ex-info`` error types (``::invalid-bgp``
``src/grafter/matcha/alpha.clj:205-213``, ``::invalid-values``
``src:215-228``) so callers can dispatch on error class the way
reference tests dispatch on ``ex-data :type`` (``test:267-272``).
"""

from __future__ import annotations


class MatchaError(Exception):
    """Base class for engine errors."""


class InvalidBgpError(MatchaError):
    """A BGP element was a collection — triple elements must be atomic
    values (reference ``src:205-213``, ``test:274-360``)."""

    def __init__(self, offending):
        self.offending = offending
        super().__init__(
            "Invalid Argument: `bgp` elements must be atomic values; "
            f"{offending!r} were not"
        )


class InvalidValuesError(MatchaError):
    """A ``values`` binding was not sequential/set/None (reference
    ``src:215-228``, ``test:430-448``)."""

    def __init__(self, offending):
        self.offending = offending
        super().__init__(
            "Invalid Argument: `values` bound arguments must be "
            f"sequence, set or None; {offending!r} were not"
        )
