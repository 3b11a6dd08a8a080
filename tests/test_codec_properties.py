"""Property-based round trips for the stdlib codecs (pure Python —
no Spark session, so hypothesis can afford many examples)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from etl_npl_pipeline_spark.operators.multimodal import (
    _decode_mp4,
    _rolling_checksum,
    encode_mp4,
)
from etl_npl_pipeline_spark.sources.files import parse_xlsx, write_xlsx


@settings(max_examples=60, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=2000),
    width=st.integers(min_value=1, max_value=4096),
    height=st.integers(min_value=1, max_value=4096),
    frame_size=st.integers(min_value=1, max_value=257),
)
def test_mp4_round_trip_property(data, width, height, frame_size):
    payload = encode_mp4(data, width, height, frame_size=frame_size)
    kind, nb, w, h, n, chk = _decode_mp4(payload)
    expect = data or b"\x00"
    assert kind == "video/mp4v"
    assert (w, h) == (width, height)
    assert nb == len(expect)
    assert n == (len(expect) + frame_size - 1) // frame_size
    assert chk == _rolling_checksum(expect)


_cell = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
        ),
        max_size=40,
    ),
)


@settings(max_examples=40, deadline=None)
@given(
    n_cols=st.integers(min_value=1, max_value=6),
    rows=st.lists(st.lists(_cell, min_size=6, max_size=6), min_size=1, max_size=8),
)
def test_xlsx_round_trip_property(n_cols, rows):
    import os
    import tempfile

    header = [f"col_{i}" for i in range(n_cols)]
    body = [r[:n_cols] for r in rows]
    all_rows = [header] + body
    path = os.path.join(tempfile.mkdtemp(), "prop.xlsx")
    write_xlsx(all_rows, path)
    back = parse_xlsx(path)
    # a fully-None trailing column has no cells on any row; the
    # parser then sees a narrower sheet — normalize both sides by
    # padding to the header width (the header row always has cells)
    width = len(header)
    back = [r + [None] * (width - len(r)) for r in back]
    assert back[0] == header
    assert len(back) == len(all_rows)
    for got, want in zip(back[1:], body):
        for g, w in zip(got, want):
            if isinstance(w, float) and not isinstance(w, bool):
                assert g == w or (g is not None and float(g) == w)
            else:
                assert g == w
