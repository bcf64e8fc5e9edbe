"""Component registries — the user-extension seam.

The reference lets users plug custom readers / indexers / retrievers /
rerankers by config name via ``ComponentFactory.register``
(/root/reference/patapsco/util/__init__.py:23-75; per-kind factories at
docs.py:30-39, topics.py:42-52, index.py:13-17, retrieve.py:15-21,
rerank.py:18-23, score.py:18-24, util/normalize.py:183-202).

Here a registered component is any callable (a Dataset-constructor for
readers, a ``map_batches`` class for stages, a builder function for
indexes). ``pipelines.Runner`` resolves names through these tables, so
a user registration changes behavior the same way a reference config
name would.
"""

from __future__ import annotations

from collections.abc import Callable

_REGISTRY: dict[str, dict[str, Callable]] = {}

KINDS = (
    "documents", "topics", "index", "retrieve", "rerank", "qrels",
    "normalize", "tokenize", "stem",
)


def register(kind: str, name: str, factory: Callable) -> None:
    """Register (or override) a component under a config name."""
    if kind not in KINDS:
        raise ValueError(f"unknown component kind {kind!r}; one of {KINDS}")
    _REGISTRY.setdefault(kind, {})[name] = factory


def resolve(kind: str, name: str) -> Callable | None:
    """Look up a user-registered component (None if absent — callers
    fall back to the built-ins)."""
    return _REGISTRY.get(kind, {}).get(name)


def registered(kind: str) -> dict[str, Callable]:
    return dict(_REGISTRY.get(kind, {}))
