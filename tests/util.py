"""Comparison helpers: set-based, unbound-marker-blind (SURVEY §2.4.3,
§2.4.7 — reference result order and marker numbers are engine-incidental)."""

from matcha_spark import Unbound

UNBOUND = "<unbound>"


def blind(x):
    """Replace Unbound markers with a sentinel, recursively; freeze
    dicts/sets/lists for set membership."""
    if isinstance(x, Unbound):
        return UNBOUND
    if isinstance(x, dict):
        return ("d", frozenset((blind(k), blind(v)) for k, v in x.items()))
    if isinstance(x, (list, tuple)):
        return tuple(blind(e) for e in x)
    if isinstance(x, (set, frozenset)):
        return ("s", frozenset(blind(e) for e in x))
    return x


def as_set(results):
    assert results is not None
    return {blind(r) for r in results}
