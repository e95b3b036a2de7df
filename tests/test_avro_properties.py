"""Property tests for the spec-level Avro binary codec (formats/avro.py)
— pure Python, no Spark session: encode→decode over generated records
must be identity for every supported type, for both codecs, across
block boundaries. Complements test_avro.py's JVM differentials."""

import datetime
import json
import math
import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from pystreams_spark.formats.avro import (
    _Cursor,
    _enc_long,
    _make_decoder,
    _make_encoder,
    iter_avro_file,
    write_avro_file,
)

AVRO_SCHEMA = {
    "type": "record",
    "name": "prop",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "opt_i", "type": ["null", "long"], "default": None},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "boolean"},
        {"name": "d", "type": "double"},
        {"name": "raw", "type": "bytes"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [
                    {"name": "x", "type": "long"},
                    {"name": "y", "type": ["null", "string"], "default": None},
                ],
            },
        },
        {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
    ],
}

_text = st.text(max_size=40)
_row = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.none() | st.integers(min_value=-(2**62), max_value=2**62),
    _text,
    st.booleans(),
    st.floats(allow_nan=False),  # NaN != NaN breaks equality, tested separately
    st.binary(max_size=32),
    st.lists(st.integers(min_value=-(2**31), max_value=2**31), max_size=8),
    st.dictionaries(_text, _text, max_size=4),
    st.tuples(
        st.integers(min_value=-(2**31), max_value=2**31), st.none() | _text
    ),
    st.dates(
        min_value=datetime.date(1, 1, 10), max_value=datetime.date(9999, 12, 20)
    ),
    st.datetimes(
        min_value=datetime.datetime(1677, 9, 22),
        max_value=datetime.datetime(2262, 4, 11),
        timezones=st.just(datetime.timezone.utc),
    ),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_row, max_size=20))
def test_record_codec_roundtrip_identity(rows):
    enc = _make_encoder(AVRO_SCHEMA)
    dec = _make_decoder(AVRO_SCHEMA)
    buf = bytearray()
    for r in rows:
        enc(r, buf)
    c = _Cursor(bytes(buf))
    for r in rows:
        got = dec(c)
        assert got == r, (got, r)
    assert c.pos == len(buf)  # no trailing bytes: framing is exact


@settings(max_examples=50, deadline=None)
@given(st.lists(_row, min_size=1, max_size=50), st.sampled_from(["null", "deflate", "bzip2", "xz"]))
def test_container_file_roundtrip_any_block_split(rows, codec):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.avro")
        # tiny blocks force multi-block files: block framing + sync
        # markers + codec must be transparent
        n = write_avro_file(path, rows, AVRO_SCHEMA, codec=codec, block_rows=3)
        assert n == len(rows)
        got = list(iter_avro_file(path))
        assert got == rows


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_varint_roundtrip(n):
    out = bytearray()
    _enc_long(n, out)
    c = _Cursor(bytes(out))
    assert c.long() == n and c.pos == len(out)


def test_nan_survives_as_nan():
    enc = _make_encoder("double")
    dec = _make_decoder("double")
    buf = bytearray()
    enc(float("nan"), buf)
    assert math.isnan(dec(_Cursor(bytes(buf))))


def test_schema_json_is_stable():
    # the writer embeds the schema verbatim; a reader of our file parses
    # exactly what we serialized (no canonicalization surprises)
    assert json.loads(json.dumps(AVRO_SCHEMA)) == AVRO_SCHEMA

@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_snappy_stored_roundtrip(payload):
    from pystreams_spark.formats.avro import snappy_compress, snappy_decompress

    assert snappy_decompress(snappy_compress(payload)) == payload


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=256))
def test_snappy_decoder_total_on_garbage(blob):
    """The decoder must terminate with ValueError/bytes on ANY input —
    never hang, never IndexError — because it runs inside ingest tasks
    on untrusted landing-zone bytes."""
    from pystreams_spark.formats.avro import snappy_decompress

    try:
        snappy_decompress(blob)
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_zstd_stored_roundtrip(payload):
    from pystreams_spark.formats.zstd import (
        zstd_compress_stored,
        zstd_decompress,
    )

    assert zstd_decompress(zstd_compress_stored(payload)) == payload


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=256))
def test_zstd_decoder_total_on_garbage(blob):
    """Terminate with ValueError or bytes on ANY input — landing-zone
    bytes are untrusted."""
    from pystreams_spark.formats.zstd import zstd_decompress

    try:
        zstd_decompress(b"\x28\xb5\x2f\xfd" + blob)
    except ValueError:
        pass
    try:
        zstd_decompress(blob)
    except ValueError:
        pass
