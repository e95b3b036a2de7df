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
def test_snappy_compress_roundtrip(payload):
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


def test_zstd_truncated_raw_and_rle_blocks_raise():
    """r8 ADVICE: a frame with no FCS whose raw/RLE block payload is cut
    short must raise, not silently decode to fewer bytes."""
    import pytest

    from pystreams_spark.formats.zstd import zstd_decompress

    magic = b"\x28\xb5\x2f\xfd"
    # frame header: fcs_code=0 single-segment would REQUIRE a 1-byte FCS;
    # use a non-single-segment header (fhd=0) + window descriptor so the
    # frame legitimately carries no FCS to cross-check the length against.
    head = magic + bytes([0x00, 0x00])
    raw_hdr = (1 | (0 << 1) | (10 << 3)).to_bytes(3, "little")  # last raw, 10 bytes
    with pytest.raises(ValueError, match="truncated raw block"):
        zstd_decompress(head + raw_hdr + b"short")
    rle_hdr = (1 | (1 << 1) | (10 << 3)).to_bytes(3, "little")  # last RLE, 10 bytes
    with pytest.raises(ValueError, match="truncated RLE block"):
        zstd_decompress(head + rle_hdr)  # repeated byte missing entirely


def test_zstd_stored_rejects_nothing_and_uses_8_byte_fcs_form():
    """r8 ADVICE: fcs_code 3 (8-byte FCS) must be emitted for giant
    inputs instead of crashing in int.to_bytes. We can't allocate 4 GiB
    in a unit test, so check the header form directly at the boundary
    via the encoder's own branch (monkeypatched length is not possible
    without fakes — instead assert small inputs still decode and the
    8-byte branch produces a self-consistent header)."""
    from pystreams_spark.formats.zstd import zstd_compress_stored, zstd_decompress

    # normal path still round-trips
    assert zstd_decompress(zstd_compress_stored(b"abc" * 100)) == b"abc" * 100
    # exercise the fcs_code selection logic for the 8-byte form without
    # materializing 4 GiB: replicate the encoder's branch arithmetic
    n = 1 << 32
    assert not (n < 256) and not (n - 256 < 65536) and not (n < 1 << 32)
    # and the header the encoder would emit for such n is decodable:
    # build a tiny frame that CLAIMS fcs via the 8-byte form with n=3
    magic = b"\x28\xb5\x2f\xfd"
    fhd = (3 << 6) | (1 << 5)  # fcs_code=3, single-segment
    frame = magic + bytes([fhd]) + (3).to_bytes(8, "little")
    frame += (1 | (0 << 1) | (3 << 3)).to_bytes(3, "little") + b"xyz"
    assert zstd_decompress(frame) == b"xyz"


def test_union_info_normalizes_dict_spelled_primitives():
    """r8 ADVICE: [{"type":"int"},{"type":"long"}] must classify as
    int_long → long (spark-avro normalizes schema forms), not struct."""
    from pyspark.sql import types as T

    from pystreams_spark.formats.avro import avro_to_spark

    assert avro_to_spark([{"type": "int"}, {"type": "long"}]) == T.LongType()
    assert avro_to_spark(["null", {"type": "float"}, "double"]) == T.DoubleType()
    # logicalType-bearing dicts must NOT normalize away
    got = avro_to_spark(
        [{"type": "int", "logicalType": "date"}, "string"]
    )
    assert isinstance(got, T.StructType)


def test_snappy_really_compresses_and_survives_regime_change():
    """r8: the encoder is no longer stored-mode — repetitive payloads
    must SHRINK, incompressible ones stay ~1:1 fast (skip heuristic,
    stride capped at 32 so a late compressible tail is still found)."""
    import os

    from pystreams_spark.formats.avro import snappy_compress, snappy_decompress

    text = b"the same boilerplate line over and over\n" * 400
    c = snappy_compress(text)
    assert len(c) < len(text) / 10
    assert snappy_decompress(c) == text

    rnd = os.urandom(50_000)
    c2 = snappy_compress(rnd)
    assert len(c2) <= len(rnd) * 1.01
    assert snappy_decompress(c2) == rnd

    mixed = rnd + text * 5
    c3 = snappy_compress(mixed)
    assert len(c3) < len(rnd) + len(text) * 5 * 0.2
    assert snappy_decompress(c3) == mixed


def test_zstd_rle_blocks_collapse_runs():
    """r8: runs ≥ 1 KiB emit RLE blocks — constant payloads collapse
    ~128k:1, mixed payloads round-trip, short runs stay raw."""
    import os

    from pystreams_spark.formats.zstd import zstd_compress_stored, zstd_decompress

    zeros = b"\x00" * 300_000
    c = zstd_compress_stored(zeros)
    assert len(c) < 64 and zstd_decompress(c) == zeros
    mixed = os.urandom(100) + b"A" * 5000 + os.urandom(50) + b"B" * 1023
    c2 = zstd_compress_stored(mixed)
    assert len(c2) < len(mixed) / 3
    assert zstd_decompress(c2) == mixed


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_zstd_real_compress_roundtrip(payload):
    """r9: the REAL compressor round-trips arbitrary bytes through our
    own decoder (the zstd-jni differential covers the libzstd side)."""
    from pystreams_spark.formats.zstd import zstd_compress, zstd_decompress

    assert zstd_decompress(zstd_compress(payload)) == payload


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.tuples(st.binary(min_size=1, max_size=24),
                  st.integers(min_value=1, max_value=60)),
        min_size=1, max_size=40,
    )
)
def test_zstd_real_compress_roundtrip_repetitive(chunks):
    """Repetition-heavy payloads exercise the sequence path (matches,
    long literal runs, multi-block when large) — the shapes the raw
    fallback would otherwise hide."""
    from pystreams_spark.formats.zstd import zstd_compress, zstd_decompress

    payload = b"".join(c * k for c, k in chunks)
    assert zstd_decompress(zstd_compress(payload)) == payload
