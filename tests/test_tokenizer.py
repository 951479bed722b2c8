"""The three tokenizer implementations (Python / Arrow / DuckDB SQL) must agree."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from lighthouse_ray.analysis import (
    flat_tokens,
    sql_tokens_expr,
    tokenize_array,
    tokenize_text,
)

CASES = [
    "getHTTPResponse",
    "snake_case_name and CamelCase mixedUpTOKENStream",
    "def buildIndexShard(self, shard_id):",
    "x = parse_query(q2, 42)  # interesting and amazing facts",
    "ABCdef aB A1b2C3",
    "",
    "___",
    "UPPER lower 123 mix3dCase",
    'msg = "flush segment done"',
    "éléphant Überraschung naïve",  # non-ascii acts as separator consistency check
]


def test_python_basic():
    assert tokenize_text("getHTTPResponse") == ["get", "http", "response"]
    assert tokenize_text("snake_case_x") == ["snake", "case", "x"]
    assert tokenize_text("") == []
    assert tokenize_text(None) == []
    assert tokenize_text("A1b2C3") == ["a1b2", "c3"]


def test_arrow_matches_python():
    arr = pa.array(CASES)
    lists = tokenize_array(arr).to_pylist()
    for text, got in zip(CASES, lists):
        assert got == tokenize_text(text), text


def test_flat_tokens_positions():
    arr = pa.array(["a b a", "", "one_two"])
    parents, pos, terms, n = flat_tokens(arr)
    assert n == 3
    assert terms.to_pylist() == ["a", "b", "a", "one", "two"]
    assert parents.tolist() == [0, 0, 0, 2, 2]
    assert pos.tolist() == [0, 1, 2, 0, 1]


@pytest.mark.parametrize("text", CASES)
def test_duckdb_matches_python(text):
    con = duckdb.connect()
    expr = sql_tokens_expr("t")
    got = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [text]).fetchone()[0]
    # non-ascii: python lower() and duckdb lower() may differ on unicode;
    # our corpus is ASCII — compare on the ascii-token level
    assert got == tokenize_text(text), text


def test_null_handling():
    arr = pa.array(["a b", None, "c"])
    lists = tokenize_array(arr).to_pylist()
    assert lists[0] == ["a", "b"]
    assert lists[2] == ["c"]
    assert lists[1] in (None, [])


# ---------------------------------------------------------------------------
# Property-based parity: the byte-wise Arrow path vs the Python reference
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_alphabet = st.sampled_from(
    list("abcXYZ019_-./ \t\n")
    + ["é", "Ü", "ß", "中", "🙂", "́", "\x00", "\x7f"]
)
_texts = st.lists(st.text(alphabet=_alphabet, max_size=40), min_size=0, max_size=8)


@settings(max_examples=200, deadline=None)
@given(_texts)
def test_flat_tokens_fuzz_parity(texts):
    arr = pa.array(texts, type=pa.string())
    parents, pos, terms, n = flat_tokens(arr)
    assert n == len(texts)
    terms_py = terms.to_pylist()
    for i, text in enumerate(texts):
        idx = np.flatnonzero(parents == i)
        got = [terms_py[int(j)] for j in idx]
        assert got == tokenize_text(text), (i, text)
        assert pos[idx].tolist() == list(range(len(got)))


@settings(max_examples=50, deadline=None)
@given(_texts)
def test_flat_tokens_sliced_input(texts):
    """Offsets handling: a sliced array must tokenize like a fresh copy."""
    pad = ["PADDING camelCase"] * 2
    arr = pa.array(pad + texts + pad, type=pa.string()).slice(2, len(texts))
    parents, pos, terms, n = flat_tokens(arr)
    assert n == len(texts)
    terms_py = terms.to_pylist()
    for i, text in enumerate(texts):
        idx = np.flatnonzero(parents == i)
        assert [terms_py[int(j)] for j in idx] == tokenize_text(text)
