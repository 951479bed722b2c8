"""Code-aware tokenizer — the engine's single text-analysis definition.

The reference delegates analysis to Elasticsearch's *standard analyzer*
(dynamic mapping, no custom analyzers: reference app/es/index/claims.go:9-32
— Unicode word segmentation + lowercase, no stemming/stopwords) and adds
its own name stripping/compression (app/model/claim.go:170-185,
app/actions/search/query.go:193,212).  For a source-code corpus the analog
is an *identifier-splitting* tokenizer:

    1. split camelCase boundaries        ``getHTTPResponse -> get HTTP Response``
    2. lowercase
    3. split on runs of non-``[a-z0-9]`` (this covers snake_case, paths,
       punctuation, whitespace), dropping empty tokens

Three implementations of the SAME definition live here and MUST stay in
lock-step (tests assert it):

- :func:`tokenize_text`     — pure-Python (``re``), used by the query parser
  and the in-memory oracle scorer.
- :func:`tokenize_array` / :func:`flat_tokens` — vectorized pyarrow.compute
  (RE2) kernels, used in the hot ``map_batches`` indexing path.  No Python
  loop over rows anywhere.
- :func:`sql_tokens_expr`   — the equivalent DuckDB SQL expression (DuckDB
  regexes are also RE2), used to build the ``oracle_sql()`` strings the
  driver checks against.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Boundary 1 first: "HTTPResponse" -> "HTTP Response"; then boundary 2:
# "getHTTP" -> "get HTTP".  Order matters and is identical in all three
# implementations.
CAMEL_BOUNDARY_1 = r"([A-Z]+)([A-Z][a-z])"
CAMEL_BOUNDARY_2 = r"([a-z0-9])([A-Z])"
TOKEN_SPLIT = r"[^a-z0-9]+"

_RE_B1 = re.compile(CAMEL_BOUNDARY_1)
_RE_B2 = re.compile(CAMEL_BOUNDARY_2)
_RE_SPLIT = re.compile(TOKEN_SPLIT)


# ---------------------------------------------------------------------------
# Pure-Python reference implementation
# ---------------------------------------------------------------------------

def tokenize_text(text: str | None) -> list[str]:
    """Tokenize one string. Reference implementation (query side / oracle)."""
    if not text:
        return []
    x = _RE_B1.sub(r"\1 \2", text)
    x = _RE_B2.sub(r"\1 \2", x)
    x = x.lower()
    return [t for t in _RE_SPLIT.split(x) if t]


# ---------------------------------------------------------------------------
# Vectorized Arrow implementation (the hot path)
# ---------------------------------------------------------------------------

def normalize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """camel-split + lowercase a string array (RE2 kernels, no row loop)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    x = pc.replace_substring_regex(arr, pattern=CAMEL_BOUNDARY_1, replacement=r"\1 \2")
    x = pc.replace_substring_regex(x, pattern=CAMEL_BOUNDARY_2, replacement=r"\1 \2")
    return pc.utf8_lower(x)


def tokenize_array(arr: pa.Array | pa.ChunkedArray) -> pa.ListArray:
    """Tokenize a string array into ``list<string>`` (empties removed)."""
    parents, _pos, terms, n_rows = flat_tokens(arr)
    counts = np.bincount(parents, minlength=n_rows)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int64()), terms)


def flat_tokens(
    arr: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, np.ndarray, pa.Array, int]:
    """Flatten a string column to its token stream.

    Returns ``(parent_row_idx, position_in_row, term, n_rows)`` where the
    first two are int64 numpy arrays and ``term`` is a pyarrow string array.
    Positions count only non-empty tokens, 0-based per row — these are the
    positions stored in the positional postings (phrase queries, reference
    app/actions/search/query.go:136-140 ``match_phrase``).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_rows = len(arr)
    if n_rows == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
            pa.array([], type=pa.string()),
            0,
        )
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    # Fully byte-wise tokenization over the RAW UTF-8 buffer — no RE2
    # pass at all.  The reference semantics (camel-split regexes, then
    # lowercase, then split on [^a-z0-9]+) reduce to byte rules because
    # all four classes are pure ASCII and every byte of a multi-byte
    # UTF-8 char is a separator either way:
    #   token chars: [A-Za-z0-9]; extra breaks INSIDE an alnum run
    #   before byte i when  (prev in [a-z0-9] and i in [A-Z])   (camel-2)
    #   or (prev in [A-Z] and i in [A-Z] and next in [a-z])     (camel-1)
    # Sequential-substitution order cannot differ from these simultaneous
    # rules: camel-1 only inserts between two uppers, camel-2 only
    # between lower/digit and upper, so neither creates or destroys the
    # other's match sites (fuzz-tested against the re reference).
    off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs_all = np.frombuffer(arr.buffers()[1], dtype=off_dt)[
        arr.offset : arr.offset + n_rows + 1
    ].astype(np.int64)
    base = int(offs_all[0])
    d = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[base : int(offs_all[-1])]
    offs = offs_all - base
    m = len(d)
    if m == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
            pa.array([], type=pa.string()),
            n_rows,
        )
    up = (d >= 65) & (d <= 90)
    lo = (d >= 97) & (d <= 122)
    dig = (d >= 48) & (d <= 57)
    alnum = up | lo | dig
    lodig = lo | dig

    prev_alnum = np.empty(m, dtype=bool)
    prev_alnum[0] = False
    prev_alnum[1:] = alnum[:-1]
    prev_up = np.empty(m, dtype=bool)
    prev_up[0] = False
    prev_up[1:] = up[:-1]
    prev_lodig = np.empty(m, dtype=bool)
    prev_lodig[0] = False
    prev_lodig[1:] = lodig[:-1]
    next_lo = np.empty(m, dtype=bool)
    next_lo[-1] = False
    next_lo[:-1] = lo[1:]
    # force breaks at row boundaries (rows are contiguous in the buffer)
    rs = offs[1:-1]
    rs_in = rs[(rs > 0) & (rs < m)]
    prev_alnum[rs_in] = False
    prev_up[rs_in] = False
    prev_lodig[rs_in] = False
    next_lo[rs_in - 1] = False

    camel = up & (prev_lodig | (prev_up & next_lo))
    starts_m = alnum & (~prev_alnum | camel)
    next_start = np.empty(m, dtype=bool)
    next_start[-1] = False
    next_start[:-1] = starts_m[1:]
    next_alnum = np.empty(m, dtype=bool)
    next_alnum[-1] = False
    next_alnum[:-1] = alnum[1:]
    next_alnum[rs_in - 1] = False
    ends_m = alnum & (~next_alnum | next_start)

    starts_b = np.flatnonzero(starts_m)
    ends_b = np.flatnonzero(ends_m)  # inclusive
    lens = ends_b - starts_b + 1
    ntok = len(starts_b)
    if ntok == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
            pa.array([], type=pa.string()),
            n_rows,
        )
    parents = np.searchsorted(offs, starts_b, side="right") - 1
    # positions: running index within each parent (parents is non-decreasing)
    change = np.empty(ntok, dtype=bool)
    change[0] = True
    np.not_equal(parents[1:], parents[:-1], out=change[1:])
    pstarts = np.flatnonzero(change)
    pcounts = np.diff(np.append(pstarts, ntok))
    pos = np.arange(ntok, dtype=np.int64) - np.repeat(pstarts, pcounts)
    # token bytes: every alnum byte belongs to exactly one token, in
    # order — the concatenated token buffer is just the alnum mask copy,
    # lowercased in place (uppers are ASCII, +32)
    tok_bytes = d[alnum]
    upper_sel = (tok_bytes >= 65) & (tok_bytes <= 90)
    if upper_sel.any():
        tok_bytes[upper_sel] += 32
    tok_offs64 = np.zeros(ntok + 1, dtype=np.int64)
    np.cumsum(lens, out=tok_offs64[1:])
    if tok_offs64[-1] > np.iinfo(np.int32).max:
        # >2 GiB of token bytes in one slice: int32 offsets would wrap
        # silently — switch to large_utf8 (int64 offsets)
        terms = pa.Array.from_buffers(
            pa.large_utf8(),
            ntok,
            [None, pa.py_buffer(tok_offs64.tobytes()), pa.py_buffer(tok_bytes.tobytes())],
        )
    else:
        tok_offs = tok_offs64.astype(np.int32)
        terms = pa.Array.from_buffers(
            pa.utf8(),
            ntok,
            [None, pa.py_buffer(tok_offs.tobytes()), pa.py_buffer(tok_bytes.tobytes())],
        )
    return parents.astype(np.int64, copy=False), pos, terms, n_rows


# ---------------------------------------------------------------------------
# DuckDB oracle expression (kept textually next to the kernels on purpose)
# ---------------------------------------------------------------------------

def sql_norm_expr(col: str) -> str:
    """DuckDB expression: camel-split + lowercase of ``col``."""
    return (
        "lower(regexp_replace(regexp_replace({c}, "
        "'([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'), "
        "'([a-z0-9])([A-Z])', '\\1 \\2', 'g'))"
    ).format(c=col)


def sql_tokens_expr(col: str) -> str:
    """DuckDB expression producing the token list (empties removed)."""
    return (
        "list_filter(regexp_split_to_array({norm}, '[^a-z0-9]+'), t -> t <> '')"
    ).format(norm=sql_norm_expr(col))
