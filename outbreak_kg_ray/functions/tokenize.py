"""Shared whitespace tokenizer — ONE semantics for every lmdata /
pack / perplexity operator and their DuckDB oracles.

Semantics: split on the single space character and drop empties —
exactly the oracle expression
``list_filter(string_split(text, ' '), x -> x <> '')``.  Python's
``str.split()`` (any whitespace run) agrees with this on space-only
text but silently diverges on tabs/newlines, which was a latent
parity trap (round-4 advisor finding): some ops used ``split()``,
some ``split(" ")``.  Every token-consuming op now routes through
this module so engine and oracle can only diverge together.

Two call styles:

- :func:`tokens` — per-string Python helper for pair-generation
  loops that genuinely need Python objects;
- :func:`split_tokens` / :func:`token_counts` — vectorized Arrow
  path (one ``split_pattern`` kernel per batch, ``np.bincount`` for
  per-row stats; no Python loop over rows or words), the pattern
  established by ``docops.gopher_quality``.

NOT the same as ``stages.decontam.tokenize`` — that one mirrors
``string_split(trim(text), ' ')`` (interior empties KEPT) for the
n-gram ops whose oracles are written that way.  These are the only
two tokenizer semantics in the repo; every op uses the one its
oracle uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tokens(x: str) -> list[str]:
    """Oracle-exact token list for one string (Python loop sites)."""
    return [w for w in x.split(" ") if w]


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def split_tokens(col):
    """Vectorized split of a string column.

    Returns ``(flat, doc_idx, nonempty)`` where ``flat`` is the flat
    Arrow array of raw split pieces (empties INCLUDED — callers mask
    with ``nonempty``), ``doc_idx`` maps each piece to its source-row
    index, and ``nonempty`` is the boolean keep-mask implementing the
    drop-empties half of the oracle semantics.  Null input strings
    contribute zero pieces.
    """
    arr = _as_array(col)
    split = pc.split_pattern(arr, " ")
    offsets = split.offsets.to_numpy()
    flat = split.values
    doc_idx = np.repeat(np.arange(len(arr)), np.diff(offsets))
    nonempty = pc.greater(
        pc.utf8_length(flat), 0
    ).to_numpy(zero_copy_only=False)
    return flat, doc_idx, nonempty


def token_counts(col) -> np.ndarray:
    """Per-row nonempty-token counts, fully vectorized."""
    arr = _as_array(col)
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    _, doc_idx, nonempty = split_tokens(arr)
    return np.bincount(
        doc_idx, weights=nonempty, minlength=n
    ).astype(np.int64)


def flat_tokens(col):
    """All nonempty tokens of a string column as ONE flat Arrow
    string array plus the source-row index of each token — the input
    shape for vocabulary counting (``pc.value_counts``) and for
    within-row adjacency at distance d (compare
    ``doc_idx[:-d] == doc_idx[d:]``)."""
    flat, doc_idx, nonempty = split_tokens(col)
    mask = pa.array(nonempty)
    return flat.filter(mask), doc_idx[nonempty]
