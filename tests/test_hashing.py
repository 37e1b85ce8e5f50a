"""Hash goldens (environment-free, FIXTURES.md §3) and the Spark
column-expression twin of intmd5/signed-low64."""

import hashlib
import struct

from gdal2mbtiles_spark.functions.hashing import (
    BORDER_TILE_ID, BORDER_TILE_MD5, intmd5, signed_low64,
    tile_id_col, tile_id_of_bytes)


def reference_pack_trick(hashed: int) -> int:
    # the exact reinterpretation at reference mbtiles.py:512-514
    return struct.unpack(b"q", struct.pack(
        b"Q", hashed & 0xFFFFFFFFFFFFFFFF))[0]


def test_golden_1x1_transparent():
    # tests/test_storages.py:50-54: MD5 of 4 zero bytes
    assert (hashlib.md5(bytes(4)).hexdigest()
            == "f1d3ff8443297732862df21dc4e57262")
    assert intmd5(bytes(4)) == int("f1d3ff8443297732862df21dc4e57262", 16)


def test_golden_border_tile():
    # tests/test_helpers.py:466-481: MD5 of 262,144 zero bytes
    assert (hashlib.md5(bytes(256 * 256 * 4)).hexdigest()
            == BORDER_TILE_MD5)
    assert BORDER_TILE_ID == reference_pack_trick(
        intmd5(bytes(256 * 256 * 4)))


def test_signed_low64_matches_pack():
    for data in (b"", b"abc", b"spark", bytes(100), b"\xff" * 33):
        h = intmd5(data)
        assert signed_low64(h) == reference_pack_trick(h)


def test_tile_id_col_matches_python(spark):
    rows = [(bytearray(b"abc"),), (bytearray(bytes(256 * 256 * 4)),),
            (bytearray(b"\xff" * 64),), (bytearray(b"tile!"),)]
    df = spark.createDataFrame(rows, "px binary")
    got = [r[0] for r in df.select(
        tile_id_col(df.px).alias("tid")).collect()]
    want = [tile_id_of_bytes(bytes(r[0])) for r in rows]
    assert got == want
