"""Per-worker memo for prepared broadcast-side state.

Worker processes are reused across pipelines, so state built from a
`ray.put` object (an index, a prepared join table, a normalized query
matrix) amortizes across batches and pipelines WITHOUT paying an
actor-pool spin-up (~1s fixed per pipeline; see CLAUDE.md). Plasma caches
the *serialized* object only — `ray.get` re-deserializes per call — so the
memo holds the fully prepared Python object.

A small LRU (not clear-to-one) so concurrent stages sharing a worker (e.g.
two broadcast joins under one union) don't thrash each other's entries.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable
from typing import Any

_CAPACITY = 4
_MEMO: OrderedDict[str, Any] = OrderedDict()


def memo_broadcast(key: str, builder: Callable[[], Any]) -> Any:
    """Return the memoized value for ``key``, building it once per worker.

    ``key`` must uniquely identify the prepared state — include the
    ``ObjectRef.hex()`` of every broadcast input plus any build parameters.
    """
    val = _MEMO.get(key)
    if val is None:
        val = builder()
        _MEMO[key] = val
        if len(_MEMO) > _CAPACITY:
            _MEMO.popitem(last=False)
    else:
        _MEMO.move_to_end(key)
    return val
