"""MBTiles sink: normalized images/map SQLite file fed from DataFrames.

The MBTiles contract is inherently a single SQLite file, so this is the
one deliberately driver-side component (SURVEY.md §2.1 K3): the
distributed plan produces two DataFrames —

    images(tile_id long, tile_data binary)   # distinct payloads
    map(zoom_level int, tile_column long, tile_row long, tile_id long)

— and this writer streams them through ``toLocalIterator`` into SQLite
with the reference's exact DDL (mbtiles.py:439-481), bulk-load pragmas
(mbtiles.py:324-331) and versioned metadata validation
(mbtiles.py:69-315).  The ``tiles`` view reconstitutes
(z, x, y, tile_data) as ``map JOIN images USING (tile_id)``
(mbtiles.py:464-471) — the same join the engine exposes as a DataFrame
(operators.pyramid.tiles_view).
"""

from __future__ import annotations

import os
import sqlite3
from typing import Dict, Iterable, Optional, Tuple


class MetadataKeyError(KeyError):
    pass


class MetadataValueError(ValueError):
    pass


class InvalidFileError(ValueError):
    pass


TYPES = ("overlay", "baselayer")
FORMATS = ("png", "jpg")

# version -> (mandatory, optional); mirrors Metadata_1_0/1_1/1_2
# (reference mbtiles.py:206-315)
METADATA_VERSIONS: Dict[str, Tuple[Tuple[str, ...], Tuple[str, ...]]] = {
    "1.0": (("name", "type", "version", "description"), ()),
    "1.1": (("name", "type", "version", "description", "format"),
            ("bounds",)),
    "1.2": (("name", "type", "version", "description", "format"),
            ("bounds", "attribution")),
}

LATEST_VERSION = "1.2"

_PRAGMAS = {
    "auto_vacuum": "NONE",
    "encoding": '"UTF-8"',
    "foreign_keys": "0",
    "journal_mode": "MEMORY",
    "locking_mode": "EXCLUSIVE",
    "synchronous": "OFF",
}

_DDL = [
    """CREATE TABLE images (
        tile_id INTEGER PRIMARY KEY,
        tile_data BLOB NOT NULL
    )""",
    """CREATE TABLE map (
        zoom_level INTEGER NOT NULL,
        tile_column INTEGER NOT NULL,
        tile_row INTEGER NOT NULL,
        tile_id INTEGER NOT NULL
            REFERENCES images (tile_id)
            ON DELETE CASCADE ON UPDATE CASCADE,
        PRIMARY KEY (zoom_level, tile_column, tile_row)
    )""",
    """CREATE VIEW tiles AS
        SELECT zoom_level, tile_column, tile_row, tile_data
        FROM map, images
        WHERE map.tile_id = images.tile_id""",
    """CREATE TABLE metadata (
        name TEXT PRIMARY KEY,
        value TEXT NOT NULL
    )""",
]


def clean_metadata_value(key: str, value, version: str):
    """Apply the reference's per-key validators (_clean_type /
    _clean_format / _clean_bounds, mbtiles.py:222-291)."""
    if key == "type":
        if value not in TYPES:
            raise MetadataValueError(
                "type {0!r} must be one of: {1}".format(
                    value, ", ".join(sorted(TYPES))))
        return value
    if key == "format" and version in ("1.1", "1.2"):
        if value not in FORMATS:
            raise MetadataValueError(
                "format {0!r} must be one of: {1}".format(
                    value, ", ".join(sorted(FORMATS))))
        return value
    if key == "bounds" and version in ("1.1", "1.2"):
        # malformed input (non-numeric parts, wrong arity) must raise
        # the module's documented MetadataValueError, not a raw
        # ValueError from float()/unpacking
        try:
            if isinstance(value, str):
                parts = [float(b) for b in value.split(",")]
            else:
                parts = list(value)
            left, bottom, right, top = (round(v, 5) for v in parts)
        except (ValueError, TypeError):
            raise MetadataValueError(f"Invalid bounds: {value!r}")
        if (left >= right or bottom >= top or left < -180.0
                or right > 180.0 or bottom < -90.0 or top > 90.0):
            raise MetadataValueError(f"Invalid bounds: {value!r}")
        return f"{left!r},{bottom!r},{right!r},{top!r}"
    return value


def detect_version(keys: Iterable[str]) -> str:
    """Highest version whose mandatory keys are all present
    (reference mbtiles.py:171-180)."""
    keys = set(keys)
    version = None
    for ver in sorted(METADATA_VERSIONS):
        mandatory, _ = METADATA_VERSIONS[ver]
        if keys.issuperset(mandatory):
            version = ver
    if version is None:
        raise InvalidFileError("Invalid MBTiles file.")
    return version


class MBTilesFile:
    """Thin SQLite wrapper with the reference's schema and pragmas."""

    def __init__(self, filename: str, version: Optional[str] = None,
                 create: bool = False):
        self.filename = filename
        self.version = version
        self._conn = sqlite3.connect(filename)
        for k, v in _PRAGMAS.items():
            self._conn.execute(f"PRAGMA {k} = {v}")
        if create:
            with self._conn:
                for ddl in _DDL:
                    self._conn.execute(ddl)

    # -- lifecycle ---------------------------------------------------------
    def close(self):
        if self._conn is not None:
            self._conn.execute("PRAGMA journal_mode = DELETE")
            self._conn.close()
            self._conn = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @classmethod
    def create(cls, filename: str, metadata: Dict[str, str],
               version: Optional[str] = None) -> "MBTilesFile":
        if version is None:
            version = detect_version(metadata.keys())
        mandatory, _ = METADATA_VERSIONS[version]
        missing = set(mandatory) - set(metadata)
        if missing:
            raise MetadataKeyError(
                "Required keys missing from metadata: {0}".format(
                    ", ".join(missing)))
        if os.path.exists(filename):
            os.remove(filename)
        f = cls(filename, version=version, create=True)
        try:
            for k, v in metadata.items():
                f.set_metadata(k, v)
        except Exception:
            # don't leave an open connection and a schema-only
            # partial file where a valid one may have stood
            f.close()
            if os.path.exists(filename):
                os.remove(filename)
            raise
        return f

    # -- metadata ---------------------------------------------------------
    def set_metadata(self, key: str, value):
        value = clean_metadata_value(key, value, self.version
                                     or LATEST_VERSION)
        with self._conn:
            self._conn.execute(
                "INSERT OR REPLACE INTO metadata (name, value) "
                "VALUES (?, ?)", (key, str(value)))

    def metadata(self) -> Dict[str, str]:
        try:
            rows = self._conn.execute(
                "SELECT name, value FROM metadata").fetchall()
        except sqlite3.OperationalError:
            raise InvalidFileError("Invalid MBTiles file.")
        return dict(rows)

    # -- tile I/O ------------------------------------------------------------
    def insert(self, x: int, y: int, z: int, tile_id: int,
               data: Optional[bytes] = None):
        """Single-tile insert (reference mbtiles.py:504-534); tile_id is
        already the signed low-64 MD5."""
        with self._conn:
            if data is not None:
                self._conn.execute(
                    "INSERT OR REPLACE INTO images (tile_id, tile_data) "
                    "VALUES (?, ?)", (tile_id, sqlite3.Binary(data)))
            self._conn.execute(
                "INSERT OR REPLACE INTO map "
                "(zoom_level, tile_column, tile_row, tile_id) "
                "VALUES (?, ?, ?, ?)", (z, x, y, tile_id))

    def insert_images(self, rows: Iterable[Tuple[int, bytes]],
                      commit: bool = True):
        self._conn.executemany(
            "INSERT OR REPLACE INTO images (tile_id, tile_data) "
            "VALUES (?, ?)",
            ((tid, sqlite3.Binary(data)) for tid, data in rows))
        if commit:
            self._conn.commit()

    def insert_map(self, rows: Iterable[Tuple[int, int, int, int]],
                   commit: bool = True):
        self._conn.executemany(
            "INSERT OR REPLACE INTO map "
            "(zoom_level, tile_column, tile_row, tile_id) "
            "VALUES (?, ?, ?, ?)", rows)
        if commit:
            self._conn.commit()

    def get(self, x: int, y: int, z: int) -> Optional[bytes]:
        row = self._conn.execute(
            "SELECT tile_data FROM tiles WHERE zoom_level=? AND "
            "tile_column=? AND tile_row=?", (z, x, y)).fetchone()
        return None if row is None else row[0]

    def all(self):
        """Ordered scan (reference mbtiles.py:556-571)."""
        cur = self._conn.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data "
            "FROM tiles ORDER BY zoom_level, tile_column, tile_row")
        yield from cur


def write_mbtiles(filename: str, images_df, map_df,
                  metadata: Dict[str, str],
                  version: Optional[str] = None,
                  batch: int = 500,
                  commit_rows: int = 100_000) -> MBTilesFile:
    """Stream the distributed (images, map) pair into one SQLite file.

    images_df: DataFrame[tile_id: long, tile_data: binary] (encoded)
    map_df:    DataFrame[zoom_level, tile_column, tile_row, tile_id]

    ``toLocalIterator(prefetchPartitions=True)`` keeps driver memory
    bounded to a few partitions (SURVEY.md §7 hard part 6) while Spark
    computes the next partition concurrently with the SQLite inserts.
    Transactions are committed every ``commit_rows`` rows, not per
    ``batch`` and not once per stream: per-batch commits forced an
    fsync every 500 rows (round-3 VERDICT #8), while one giant
    transaction grows the rollback journal to ~the database size and
    a crash rolls back every row (round-4 ADVICE) — ~100k-row
    checkpoints keep fsyncs rare AND bound journal growth/crash
    rework.  Map rows are deduped last-wins on the (z,x,y) PK by the
    INSERT OR REPLACE, matching reference J4 out-of-order semantics.
    """
    f = MBTilesFile.create(filename, metadata, version=version)
    buf, since_commit = [], 0
    for row in (images_df.select("tile_id", "tile_data")
                .toLocalIterator(prefetchPartitions=True)):
        buf.append((row[0], bytes(row[1])))
        if len(buf) >= batch:
            since_commit += len(buf)
            f.insert_images(buf, commit=since_commit >= commit_rows)
            if since_commit >= commit_rows:
                since_commit = 0
            buf = []
    f.insert_images(buf)
    buf, since_commit = [], 0
    for row in (map_df.select("zoom_level", "tile_column", "tile_row",
                              "tile_id")
                .toLocalIterator(prefetchPartitions=True)):
        buf.append(tuple(row))
        if len(buf) >= batch * 20:
            since_commit += len(buf)
            f.insert_map(buf, commit=since_commit >= commit_rows)
            if since_commit >= commit_rows:
                since_commit = 0
            buf = []
    f.insert_map(buf)
    return f
