"""Session-memo fill disclosure (VERDICT r12 "what's wrong #1").

The cross-query session memos (near-dup pair table, shingle/token
streams, IVF centroids) shift their one-time fill cost onto whichever
consumer runs FIRST — and a bench contention-retry that clears a memo
shifts a refill onto the next consumer mid-run.  That made per-query
artifacts unattributable: the r12 driver run carried a 5.9 s
`graph_pagerank_dupgraph` reading whose likely cause was an upstream
retry dumping the pair-substrate refill on it, and nobody could tell
from the artifact.

Every memo build now reports a fill event here; ``bench.py`` drains the
buffer after each query and writes a per-query ``memo_fills`` map into
the bench artifact, so a substrate fill (or retry-induced refill) is
attributed to the exact query that paid for it.

This is pure bookkeeping — recording adds a dict append to a memo
build, never a Spark job — and it is process-local like the memos
themselves.
"""

from __future__ import annotations

_FILL_EVENTS: list[dict] = []


def record_fill(memo: str, seconds: float) -> None:
    """Report that the memo named ``memo`` was just filled (built +
    materialized) and took ``seconds`` of wall clock inside the current
    caller's timed region."""
    _FILL_EVENTS.append({"memo": memo, "s": round(float(seconds), 3)})


def drain_fills() -> list[dict]:
    """Return and clear every fill event recorded since the last drain
    (bench.py calls this after each query's measurement)."""
    out = list(_FILL_EVENTS)
    _FILL_EVENTS.clear()
    return out
