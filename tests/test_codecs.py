import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lighthouse_ray.codecs import (
    decode_position_lists,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_position_lists,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_simple():
    a = np.array([0, 1, 127, 128, 300, 2**14, 2**21 - 1, 2**63, 2**64 - 1], dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(a)) == a).all()


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varbyte_roundtrip_hypothesis(vals):
    a = np.array(vals, dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(a)) == a).all()


def test_delta_roundtrip():
    a = np.array([3, 5, 5 + 127, 10_000, 10_001], dtype=np.uint64)
    assert (delta_decode(delta_encode(a)) == a).all()


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300))
def test_postings_roundtrip(vals):
    a = np.array(sorted(vals), dtype=np.uint64)
    assert (decode_postings(encode_postings(a)) == a).all()


def test_position_lists_roundtrip():
    # three docs with positions [[2,5,9],[0],[7,8]]
    pos = np.array([2, 5, 9, 0, 7, 8], dtype=np.uint64)
    tfs = np.array([3, 1, 2], dtype=np.uint64)
    buf = encode_position_lists(pos, tfs)
    got, offsets = decode_position_lists(buf, tfs)
    assert (got == pos).all()
    assert offsets.tolist() == [0, 3, 4, 6]


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.sets(st.integers(min_value=0, max_value=100_000), min_size=1, max_size=40),
        min_size=1,
        max_size=30,
    )
)
def test_position_lists_hypothesis(doc_positions):
    pos = np.array([p for doc in doc_positions for p in sorted(doc)], dtype=np.uint64)
    tfs = np.array([len(d) for d in doc_positions], dtype=np.uint64)
    got, offsets = decode_position_lists(encode_position_lists(pos, tfs), tfs)
    assert (got == pos).all()
    assert offsets[-1] == len(pos)


# ---------------------------------------------------------------------------
# Identity-key parsing (build.docs.hex_prefix_u64)
# ---------------------------------------------------------------------------

def test_hex_prefix_u64_paths():
    import numpy as np
    import pyarrow as pa

    from lighthouse_ray.build.docs import hex_prefix_u64

    import random

    rng = random.Random(3)
    fixed = ["%040x" % rng.getrandbits(160) for _ in range(500)]
    mixed = fixed[:250] + ["%064x" % rng.getrandbits(256) for _ in range(250)]

    def want(vals):
        return np.array([int(v[:16], 16) for v in vals], dtype=np.uint64)

    # fixed-width reshape path
    assert (hex_prefix_u64(pa.array(fixed)) == want(fixed)).all()
    # mixed-width gather path
    assert (hex_prefix_u64(pa.array(mixed)) == want(mixed)).all()
    # sliced array (nonzero offset into parent buffers)
    sl = pa.array(fixed).slice(100, 300)
    assert (hex_prefix_u64(sl) == want(fixed[100:400])).all()
    # chunked + list inputs
    ch = pa.chunked_array([fixed[:200], fixed[200:]])
    assert (hex_prefix_u64(ch) == want(fixed)).all()
    assert (hex_prefix_u64(fixed[:10]) == want(fixed[:10])).all()
    # empty
    assert len(hex_prefix_u64(pa.array([], type=pa.string()))) == 0


def test_ordinal_map_roundtrip_and_misses():
    import numpy as np

    from lighthouse_ray.build.docs import build_ordinal_map, lookup_ordinals

    import hashlib

    doc_ids = [hashlib.sha1(f"d{i}".encode()).hexdigest() for i in range(300)]
    shas = [hashlib.sha256(f"c{i}".encode()).hexdigest() for i in range(300)]
    ords = np.arange(300, dtype=np.int64)[::-1].copy()
    packed = build_ordinal_map(doc_ids, shas, ords)
    got = lookup_ordinals(packed, doc_ids, shas)
    assert (got == ords).all()
    # same doc_id, different content hash -> miss (collision handling)
    other_shas = [hashlib.sha256(f"x{i}".encode()).hexdigest() for i in range(300)]
    assert (lookup_ordinals(packed, doc_ids, other_shas) == -1).all()
