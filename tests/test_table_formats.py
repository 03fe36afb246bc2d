"""Wire-format table providers: from-scratch Avro container codec,
Iceberg v2 metadata (avro_io.py / iceberg.py), and the Delta Lake
transaction log (delta_log.py).

Fixture strategy mirrors the KLL wire-format tests: round-trips prove
writer/reader agreement, and HAND-ASSEMBLED spec fixtures (constructed
in the test from the published layouts, independent of the writer code
path) prove the formats themselves — not just self-consistency.
"""

import json
import os

import pytest

from chronon_spark.sources.avro_io import (
    Decoder, Encoder, parse_schema, read_container, write_container,
)
from chronon_spark.sources.catalog import ParquetWarehouse
from chronon_spark.sources.delta_log import DeltaTable, mirror_to_delta
from chronon_spark.sources.iceberg import (
    MANIFEST_LIST_SCHEMA, IcebergTable, manifest_entry_schema,
    mirror_to_iceberg,
)


# ------------------------------------------------------------- avro

def test_avro_zigzag_spec_bytes():
    """Pinned to the Avro spec's zigzag table: 0->00, -1->01, 1->02,
    -2->03, 2->04, -64->7f, 64->80 01."""
    e = Encoder()
    for v in (0, -1, 1, -2, 2, -64, 64):
        e.write_long(v)
    assert e.out.getvalue() == bytes.fromhex("00010203047f8001")
    d = Decoder(e.out.getvalue())
    assert [d.read_long() for _ in range(7)] == [0, -1, 1, -2, 2, -64, 64]


def test_avro_roundtrip_all_types(tmp_path):
    schema = {
        "type": "record", "name": "r", "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"], "default": None},
            {"name": "c", "type": {"type": "array", "items": "int"}},
            {"name": "d", "type": {"type": "map", "values": "double"}},
            {"name": "e", "type": {"type": "fixed", "name": "fx", "size": 3}},
            {"name": "f", "type": {"type": "enum", "name": "col",
                                   "symbols": ["RED", "BLUE"]}},
            {"name": "g", "type": {"type": "record", "name": "inner",
                                   "fields": [{"name": "x", "type": "boolean"}]}},
            {"name": "h", "type": "inner"},  # named-type reference
        ],
    }
    recs = [
        {"a": -(2 ** 62), "b": "héllo", "c": [1, -2, 3], "d": {"k": 1.5},
         "e": b"abc", "f": "BLUE", "g": {"x": True}, "h": {"x": False}},
        {"a": 0, "b": None, "c": [], "d": {}, "e": b"xyz", "f": "RED",
         "g": {"x": False}, "h": {"x": True}},
    ]
    for codec in ("deflate", "null"):
        p = str(tmp_path / f"t_{codec}.avro")
        write_container(p, schema, recs, codec=codec)
        got_schema, meta, got = read_container(p)
        assert got == recs
        assert got_schema == schema
        assert meta["avro.codec"].decode() == codec


def test_avro_hand_assembled_container():
    """A container built byte-by-byte from the spec (magic, metadata
    map, sync, one null-codec block) — the reader path never sees the
    writer."""
    schema = {"type": "record", "name": "p",
              "fields": [{"name": "n", "type": "long"},
                         {"name": "s", "type": "string"}]}
    sync = bytes(range(16))
    body = b"\x06" + b"\x04" + b"hi"          # n=3 (zigzag 06), s="hi" (len 2 -> 04)
    meta_map = (
        b"\x04"                                # 2 map entries
        + b"\x16" + b"avro.schema"             # len 11 (zigzag 0x16)
        + _avro_bytes(json.dumps(schema).encode())
        + b"\x14" + b"avro.codec"              # len 10
        + _avro_bytes(b"null")
        + b"\x00"                              # map end
    )
    blob = (b"Obj\x01" + meta_map + sync
            + b"\x02"                          # 1 record
            + _varint_len(len(body)) + body + sync)
    got_schema, _, recs = read_container(blob)
    assert recs == [{"n": 3, "s": "hi"}]
    assert got_schema == schema


def _avro_bytes(b: bytes) -> bytes:
    return _varint_len(len(b)) + b


def _varint_len(n: int) -> bytes:
    e = Encoder()
    e.write_long(n)
    return e.out.getvalue()


def test_avro_property_roundtrip():
    """Property test (hypothesis): arbitrary records over the full type
    surface the Iceberg metadata uses — longs across the zigzag range,
    unicode strings, bytes, optional fields, nested arrays/maps — must
    round-trip bit-exact through encode/decode (no container, pure
    binary encoding)."""
    from hypothesis import given, settings, strategies as st

    schema = parse_schema({
        "type": "record", "name": "p", "fields": [
            {"name": "n", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "b", "type": ["null", "bytes"], "default": None},
            {"name": "xs", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": ["null", "string"]}},
            {"name": "f", "type": ["null", "double"], "default": None},
        ],
    })
    rec_st = st.fixed_dictionaries({
        "n": st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
        "s": st.text(max_size=40),
        "b": st.one_of(st.none(), st.binary(max_size=40)),
        "xs": st.lists(st.integers(min_value=-(2 ** 63),
                                   max_value=2 ** 63 - 1), max_size=8),
        "m": st.dictionaries(st.text(max_size=8),
                             st.one_of(st.none(), st.text(max_size=8)),
                             max_size=6),
        "f": st.one_of(st.none(), st.floats(allow_nan=False)),
    })

    @given(st.lists(rec_st, max_size=10))
    @settings(max_examples=150, deadline=None)
    def roundtrip(recs):
        enc = Encoder()
        for r in recs:
            enc.write_value(schema, r)
        dec = Decoder(enc.out.getvalue())
        assert [dec.read_value(schema) for _ in recs] == recs
        assert dec.pos == len(dec.buf)  # no trailing bytes

    roundtrip()


def test_avro_sync_mismatch_detected(tmp_path):
    p = str(tmp_path / "t.avro")
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "a", "type": "long"}]}
    write_container(p, schema, [{"a": 1}], codec="null")
    blob = bytearray(open(p, "rb").read())
    blob[-1] ^= 0xFF  # corrupt the trailing sync marker
    with pytest.raises(Exception, match="sync"):
        read_container(bytes(blob))


# ----------------------------------------------------------- fixtures

@pytest.fixture()
def committed_wh(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.insert_overwrite(spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")],
        "id long, v string, ds string"), "t")
    wh.insert_overwrite(spark.createDataFrame(
        [(3, "c", "2024-01-02"), (4, "d", "2024-01-03")],
        "id long, v string, ds string"), "t")
    wh.insert_overwrite(spark.createDataFrame(
        [(9, "z", "2024-01-01")], "id long, v string, ds string"), "t")
    return wh


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ----------------------------------------------------------- iceberg

def test_iceberg_mirror_matches_warehouse(spark, committed_wh):
    wh = committed_wh
    mirror_to_iceberg(wh, "t")
    t = IcebergTable(wh.path("t"))
    # current state == warehouse read (ds included)
    assert _rows(t.read(spark)) == _rows(wh.read("t"))
    # VERSION AS OF == snapshot-log time travel
    for sid in (1, 2, 3):
        assert _rows(t.read(spark, snapshot_id=sid)) == \
            _rows(wh.read_at("t", sid))
    # incremental appends between snapshots
    assert _rows(t.read_incremental(spark, 1, 3)) == \
        _rows(wh.read_incremental("t", 1, 3))
    # partitions from manifests alone == directory listing
    assert t.partitions() == wh.partitions("t")


def test_iceberg_metadata_is_spec_shaped(committed_wh):
    wh = committed_wh
    mfile = mirror_to_iceberg(wh, "t")
    md = json.load(open(mfile))
    assert md["format-version"] == 2
    assert md["current-snapshot-id"] == 3
    assert [s["sequence-number"] for s in md["snapshots"]] == [1, 2, 3]
    spec = md["partition-specs"][0]["fields"][0]
    assert spec["transform"] == "identity" and spec["field-id"] == 1000
    schema_ids = [f["id"] for f in md["schemas"][0]["fields"]]
    assert schema_ids == sorted(schema_ids)  # ids assigned in order
    # manifest-list rows carry the spec's counts
    _, _, manifests = read_container(md["snapshots"][-1]["manifest-list"])
    m = manifests[0]
    assert m["content"] == 0 and m["added_snapshot_id"] == 3
    assert m["added_files_count"] >= 1
    # manifest entries: status 1 for the commit's files, data_file r2
    _, mmeta, entries = read_container(m["manifest_path"])
    assert mmeta["format-version"] == b"2" and mmeta["content"] == b"data"
    assert {e["status"] for e in entries} <= {0, 1}
    df = entries[0]["data_file"]
    assert df["file_format"] == "PARQUET" and df["record_count"] >= 1


def test_iceberg_manifest_column_stats(spark, committed_wh):
    """Manifests carry real per-column stats from parquet footers:
    value/null counts and Appendix-D-encoded lower/upper bounds (int-keyed
    maps as Avro key/value-record arrays). Decoded bounds must equal the
    data's true min/max per file."""
    from chronon_spark.sources.iceberg import decode_bound

    wh = committed_wh
    mirror_to_iceberg(wh, "t")
    t = IcebergTable(wh.path("t"))
    md_schema = t.metadata["schemas"][0]["fields"]
    fid = {f["name"]: f["id"] for f in md_schema}
    typ = {f["id"]: f["type"] for f in md_schema}
    for f in t.files():
        lows = {e["key"]: e["value"] for e in f["lower_bounds"]}
        ups = {e["key"]: e["value"] for e in f["upper_bounds"]}
        vals = {e["key"]: e["value"] for e in f["value_counts"]}
        pdf = spark.read.parquet(f["file_path"]).toPandas()
        assert vals[fid["id"]] == len(pdf) == f["record_count"]
        assert decode_bound(typ[fid["id"]], lows[fid["id"]]) == pdf["id"].min()
        assert decode_bound(typ[fid["id"]], ups[fid["id"]]) == pdf["id"].max()
        assert decode_bound(typ[fid["v"]], lows[fid["v"]]) == pdf["v"].min()
        assert decode_bound(typ[fid["v"]], ups[fid["v"]]) == pdf["v"].max()


def test_iceberg_remirror_idempotent(spark, committed_wh):
    wh = committed_wh
    mirror_to_iceberg(wh, "t")
    t1_files = {f["file_path"] for f in IcebergTable(wh.path("t")).files()}
    wh.insert_overwrite(spark.createDataFrame(
        [(7, "q", "2024-01-04")], "id long, v string, ds string"), "t")
    mirror_to_iceberg(wh, "t")
    t2 = IcebergTable(wh.path("t"))
    assert t2.current_snapshot_id() == 4
    # old snapshots still readable, new files visible
    assert t1_files < {f["file_path"] for f in t2.files()} | t1_files
    assert _rows(t2.read(spark)) == _rows(wh.read("t"))
    assert _rows(t2.read(spark, snapshot_id=3)) == _rows(wh.read_at("t", 3))


def test_iceberg_unknown_snapshot_raises(committed_wh):
    mirror_to_iceberg(committed_wh, "t")
    t = IcebergTable(committed_wh.path("t"))
    with pytest.raises(ValueError, match="unknown or expired"):
        t.files(snapshot_id=99)


def test_iceberg_hand_built_metadata_tree(spark, tmp_path):
    """A minimal v2 metadata tree assembled directly from the spec —
    one data file, one manifest, one manifest list, one metadata.json —
    with NO involvement of mirror_to_iceberg. The reader must plan and
    scan it."""
    loc = str(tmp_path / "ice")
    meta_dir = os.path.join(loc, "metadata")
    os.makedirs(meta_dir)
    spark.createDataFrame([(5, "x")], "id long, v string") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(loc, "data"))
    data_file = [os.path.join(loc, "data", f)
                 for f in os.listdir(os.path.join(loc, "data"))
                 if f.endswith(".parquet")][0]

    entry_schema = manifest_entry_schema(
        [{"name": "ds", "type": "string", "field-id": 1000}])
    mpath = os.path.join(meta_dir, "manual-m0.avro")
    write_container(mpath, entry_schema, [{
        "status": 1, "snapshot_id": 10, "sequence_number": None,
        "file_sequence_number": None,
        "data_file": {
            "content": 0, "file_path": data_file,
            "file_format": "PARQUET", "partition": {"ds": "2024-06-01"},
            "record_count": 1,
            "file_size_in_bytes": os.path.getsize(data_file),
            "value_counts": None, "null_value_counts": None,
            "lower_bounds": None, "upper_bounds": None,
            "split_offsets": None, "sort_order_id": None,
        }}],
        metadata={"format-version": "2", "content": "data"})
    lpath = os.path.join(meta_dir, "snap-10-1-manual.avro")
    write_container(lpath, MANIFEST_LIST_SCHEMA, [{
        "manifest_path": mpath,
        "manifest_length": os.path.getsize(mpath),
        "partition_spec_id": 0, "content": 0,
        "sequence_number": 1, "min_sequence_number": 1,
        "added_snapshot_id": 10,
        "added_files_count": 1, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": 1,
        "existing_rows_count": 0, "deleted_rows_count": 0,
        "partitions": None, "key_metadata": None,
    }], metadata={"format-version": "2"})
    md = {
        "format-version": 2, "table-uuid": "0" * 32, "location": loc,
        "last-sequence-number": 1, "last-updated-ms": 1700000000000,
        "last-column-id": 3, "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "string"},
            {"id": 3, "name": "ds", "required": False, "type": "string"},
        ]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "ds", "transform": "identity",
             "source-id": 3, "field-id": 1000}]}],
        "last-partition-id": 1000, "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": 10,
        "snapshots": [{"snapshot-id": 10, "parent-snapshot-id": None,
                       "sequence-number": 1,
                       "timestamp-ms": 1700000000000,
                       "manifest-list": lpath,
                       "summary": {"operation": "append"},
                       "schema-id": 0}],
        "snapshot-log": [{"timestamp-ms": 1700000000000,
                          "snapshot-id": 10}],
        "metadata-log": [], "properties": {},
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    t = IcebergTable(loc)
    assert t.partitions() == ["2024-06-01"]
    assert _rows(t.read(spark)) == [(5, "x", "2024-06-01")]
    assert _rows(t.read(spark, as_of_ms=1700000000001)) == \
        [(5, "x", "2024-06-01")]
    with pytest.raises(ValueError, match="no snapshot"):
        t.read(spark, as_of_ms=1699999999999)


def test_iceberg_merge_on_read_deletes(spark, tmp_path):
    """A hand-built v2 MERGE-ON-READ tree: one data file (seq 1) plus a
    delete manifest (seq 2) carrying a position delete, an applicable
    equality delete, and an equality delete whose sequence number is NOT
    strictly greater than the data file's (must be ignored per spec).
    All files assembled directly from the spec — the writer is never
    involved (the engine's own writes are copy-on-write)."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    loc = str(tmp_path / "mor")
    meta_dir = os.path.join(loc, "metadata")
    os.makedirs(os.path.join(loc, "data"))
    os.makedirs(meta_dir)

    data_path = os.path.join(loc, "data", "d0.parquet")
    papq.write_table(pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                               "v": ["a", "b", "c", "d"]}), data_path)
    pos_path = os.path.join(loc, "data", "pd0.parquet")
    papq.write_table(pa.table({  # pos 0 -> removes id=1
        "file_path": [data_path], "pos": pa.array([0], pa.int64())}),
        pos_path)
    eq_path = os.path.join(loc, "data", "ed0.parquet")
    papq.write_table(pa.table({"id": pa.array([3], pa.int64())}), eq_path)
    eq_stale_path = os.path.join(loc, "data", "ed1.parquet")
    papq.write_table(pa.table({"id": pa.array([4], pa.int64())}),
                     eq_stale_path)

    entry_schema = manifest_entry_schema(
        [{"name": "ds", "type": "string", "field-id": 1000}])

    def dfile(path, content, equality_ids=None):
        return {
            "content": content, "file_path": path,
            "file_format": "PARQUET", "partition": {"ds": "2024-06-01"},
            "record_count": 1, "file_size_in_bytes": os.path.getsize(path),
            "value_counts": None, "null_value_counts": None,
            "lower_bounds": None, "upper_bounds": None,
            "split_offsets": None, "equality_ids": equality_ids,
            "sort_order_id": None,
        }

    def entry(path, content, seq, equality_ids=None):
        return {"status": 1, "snapshot_id": 20, "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": dfile(path, content, equality_ids)}

    dman = os.path.join(meta_dir, "mor-data-m0.avro")
    write_container(dman, entry_schema, [entry(data_path, 0, 1)],
                    metadata={"format-version": "2", "content": "data"})
    delman = os.path.join(meta_dir, "mor-del-m0.avro")
    write_container(delman, entry_schema, [
        entry(pos_path, 1, 2),
        entry(eq_path, 2, 2, equality_ids=[1]),       # applies (2 > 1)
        entry(eq_stale_path, 2, 1, equality_ids=[1]),  # ignored (1 !> 1)
    ], metadata={"format-version": "2", "content": "deletes"})

    def mlist_row(path, content, seq):
        return {"manifest_path": path,
                "manifest_length": os.path.getsize(path),
                "partition_spec_id": 0, "content": content,
                "sequence_number": seq, "min_sequence_number": 1,
                "added_snapshot_id": 20, "added_files_count": 1,
                "existing_files_count": 0, "deleted_files_count": 0,
                "added_rows_count": 1, "existing_rows_count": 0,
                "deleted_rows_count": 0, "partitions": None,
                "key_metadata": None}

    lpath = os.path.join(meta_dir, "snap-20-1-mor.avro")
    write_container(lpath, MANIFEST_LIST_SCHEMA,
                    [mlist_row(dman, 0, 1), mlist_row(delman, 1, 2)],
                    metadata={"format-version": "2"})
    md = {
        "format-version": 2, "table-uuid": "1" * 32, "location": loc,
        "last-sequence-number": 2, "last-updated-ms": 1700000000000,
        "last-column-id": 3, "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "string"},
            {"id": 3, "name": "ds", "required": False, "type": "string"},
        ]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "ds", "transform": "identity",
             "source-id": 3, "field-id": 1000}]}],
        "last-partition-id": 1000, "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": 20,
        "snapshots": [{"snapshot-id": 20, "parent-snapshot-id": None,
                       "sequence-number": 2,
                       "timestamp-ms": 1700000000000,
                       "manifest-list": lpath,
                       "summary": {"operation": "overwrite"},
                       "schema-id": 0}],
        "snapshot-log": [{"timestamp-ms": 1700000000000,
                          "snapshot-id": 20}],
        "metadata-log": [], "properties": {},
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    t = IcebergTable(loc)
    # id=1 position-deleted, id=3 equality-deleted, id=4 kept (stale seq)
    assert _rows(t.read(spark)) == [(2, "b", "2024-06-01"),
                                    (4, "d", "2024-06-01")]
    # plan stays helper-free
    assert set(t.read(spark).columns) == {"id", "v", "ds"}


def test_iceberg_mirror_rebuilds_after_expiry(spark, committed_wh):
    """expire_snapshots rebases the internal log and GC's old files; the
    next mirror call must rebuild the Iceberg metadata — expired
    snapshots leave the snapshot list (Iceberg expireSnapshots
    semantics) and the retained versions stay readable."""
    wh = committed_wh
    mirror_to_iceberg(wh, "t")
    wh.expire_snapshots("t", retain_last=2, grace_seconds=0)
    mirror_to_iceberg(wh, "t")
    t = IcebergTable(wh.path("t"))
    assert [s["snapshot-id"] for s in t.snapshots()] == [2, 3]
    assert _rows(t.read(spark)) == _rows(wh.read("t"))
    assert _rows(t.read(spark, snapshot_id=2)) == _rows(wh.read_at("t", 2))
    with pytest.raises(ValueError, match="unknown or expired"):
        t.read(spark, snapshot_id=1)
    # prior metadata versions' manifests were not overwritten in place
    md = json.load(open(os.path.join(
        wh.path("t"), "metadata", "v2.metadata.json")))
    assert md["metadata-log"], "rebuild must chain to the prior metadata"


def test_recover_partition_broadcast_path(spark, tmp_path):
    """Above 64 files the ds recovery switches from a literal map to a
    broadcast join — same values either way, plan stays flat at real
    manifest scale."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    rows = [(i, f"2024-03-{i % 9 + 1:02d}") for i in range(90)]
    df = spark.createDataFrame(rows, "id long, ds string").repartition(90, "id")
    wh.insert_overwrite(df, "big")
    mirror_to_iceberg(wh, "big")
    t = IcebergTable(wh.path("big"))
    assert len(t.files()) > 64  # exercises the join path
    got = {(r.id, r.ds) for r in t.read(spark).collect()}
    assert got == set(rows)


# ------------------------------------------------------------- delta

def test_delta_mirror_matches_warehouse(spark, committed_wh):
    wh = committed_wh
    mirror_to_delta(wh, "t", spark)
    dt = DeltaTable(wh.path("t"))
    assert dt.versions() == [0, 1, 2]
    assert _rows(dt.read(spark)) == _rows(wh.read("t"))
    for sid in (1, 2, 3):  # internal snapshot N == delta version N-1
        assert _rows(dt.read(spark, version=sid - 1)) == \
            _rows(wh.read_at("t", sid))
    assert _rows(dt.read_incremental(spark, 0, 2)) == \
        _rows(wh.read_incremental("t", 1, 3))
    assert dt.partitions() == wh.partitions("t")


def test_delta_checkpoint_replay_equals_json_replay(spark, committed_wh):
    wh = committed_wh
    mirror_to_delta(wh, "t", spark, checkpoint_interval=2)
    dt = DeltaTable(wh.path("t"))
    assert os.path.exists(os.path.join(
        dt.log_dir, "00000000000000000001.checkpoint.parquet"))
    last_cp = json.load(open(os.path.join(dt.log_dir, "_last_checkpoint")))
    assert last_cp["version"] == 1
    # state via checkpoint+tail must equal a pure-JSON replay: nuke the
    # checkpoint in a copy and compare
    with_cp = {a["path"] for a in dt.files()}
    import shutil
    alt = str(wh.path("t")) + "_nocp"
    shutil.copytree(wh.path("t"), alt)
    for f in os.listdir(os.path.join(alt, "_delta_log")):
        if "checkpoint" in f or f == "_last_checkpoint":
            os.unlink(os.path.join(alt, "_delta_log", f))
    assert {a["path"] for a in DeltaTable(alt).files()} == with_cp


def test_delta_hand_written_log(spark, tmp_path):
    """A _delta_log written line-by-line from PROTOCOL.md (protocol,
    metaData, add/remove across two commits) — reader never sees the
    mirror writer."""
    loc = str(tmp_path / "d")
    os.makedirs(os.path.join(loc, "_delta_log"))
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(loc, "part"))
    rel = ["part/" + f for f in os.listdir(os.path.join(loc, "part"))
           if f.endswith(".parquet")][0]
    schema_string = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        {"name": "ds", "type": "string", "nullable": True, "metadata": {}},
    ]})
    v0 = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "m-1", "format": {"provider": "parquet",
                                              "options": {}},
                      "schemaString": schema_string,
                      "partitionColumns": ["ds"], "configuration": {},
                      "createdTime": 1700000000000}},
        {"add": {"path": rel, "partitionValues": {"ds": "2024-06-01"},
                 "size": os.path.getsize(os.path.join(loc, rel)),
                 "modificationTime": 1700000000000, "dataChange": True}},
    ]
    v1 = [
        {"commitInfo": {"timestamp": 1700000100000,
                        "operation": "DELETE"}},
        {"remove": {"path": rel, "deletionTimestamp": 1700000100000,
                    "dataChange": True}},
    ]
    for ver, actions in ((0, v0), (1, v1)):
        with open(os.path.join(loc, "_delta_log",
                               f"{ver:020d}.json"), "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    dt = DeltaTable(loc)
    assert _rows(dt.read(spark, version=0)) == \
        [(1, "a", "2024-06-01"), (2, "b", "2024-06-01")]
    assert dt.files(version=1) == []  # removed
    # TIMESTAMP AS OF picks v0 before the delete's commit ts
    assert _rows(dt.read(spark, as_of_ms=1700000050000)) == \
        [(1, "a", "2024-06-01"), (2, "b", "2024-06-01")]


def test_engine_sources_read_external_wire_formats(spark, committed_wh):
    """An EventSource pointing at an EXTERNAL Iceberg or Delta table
    (wire metadata only — the engine's own snapshot log removed) resolves
    through the format readers inside the Query-DSL scan."""
    import shutil

    from chronon_spark.sources.catalog import SNAPSHOT_DIR
    from chronon_spark.sources.scan import scan_df

    wh = committed_wh
    mirror_to_iceberg(wh, "t")
    mirror_to_delta(wh, "t", spark)
    expected = _rows(wh.read("t"))

    ice = wh.path("t") + "_ice_only"
    shutil.copytree(wh.path("t"), ice)
    shutil.rmtree(os.path.join(ice, SNAPSHOT_DIR))
    shutil.rmtree(os.path.join(ice, "_delta_log"))
    assert _rows(scan_df(spark, ice).select("id", "v", "ds")) == expected

    dl = wh.path("t") + "_delta_only"
    shutil.copytree(wh.path("t"), dl)
    shutil.rmtree(os.path.join(dl, SNAPSHOT_DIR))
    shutil.rmtree(os.path.join(dl, "metadata"))
    assert _rows(scan_df(spark, dl).select("id", "v", "ds")) == expected


def test_wire_formats_additive_schema_evolution(spark, committed_wh):
    """A commit that widens the schema (additive column, the backfill
    flow's contract): the Iceberg mirror appends a NEW schema version
    (old field ids immutable, current-schema-id advances) and the Delta
    mirror re-emits metaData; both readers return old rows with the new
    column as null, reading with the TABLE schema (no footer
    inference)."""
    wh = committed_wh
    mirror_to_iceberg(wh, "t")
    mirror_to_delta(wh, "t", spark)
    wh.insert_overwrite(spark.createDataFrame(
        [(11, "w", "2024-01-09", 2.5)],
        "id long, v string, ds string, score double"), "t")
    mirror_to_iceberg(wh, "t")
    mirror_to_delta(wh, "t", spark)

    t = IcebergTable(wh.path("t"))
    md = t.metadata
    assert len(md["schemas"]) == 2 and md["current-schema-id"] == 1
    s0 = {f["name"]: f["id"] for f in md["schemas"][0]["fields"]}
    s1 = {f["name"]: f["id"] for f in md["schemas"][1]["fields"]}
    assert all(s1[n] == i for n, i in s0.items()), "field ids must not move"
    assert "score" in s1 and s1["score"] > max(s0.values())

    # live state: ds 01-01 was overwritten by (9,z), 01-02 by (3,c)
    expected = sorted(
        [(3, "c", "2024-01-02", None), (4, "d", "2024-01-03", None),
         (9, "z", "2024-01-01", None), (11, "w", "2024-01-09", 2.5)])
    got_ice = sorted(tuple(r) for r in
                     t.read(spark).select("id", "v", "ds", "score").collect())
    assert got_ice == expected
    dt = DeltaTable(wh.path("t"))
    got_delta = sorted(tuple(r) for r in
                       dt.read(spark).select("id", "v", "ds", "score").collect())
    assert got_delta == expected
    # pre-evolution version still reads under the old metaData (no score)
    assert "score" not in dt.read(spark, version=2).columns


def test_scan_prunes_files_from_wire_metadata(spark, committed_wh):
    """A Query with partition bounds over an Iceberg/Delta path must drop
    out-of-range FILES from the plan (manifest/log partition tuples), not
    just filter rows — input_file_name() shows which files were scanned."""
    import shutil

    from pyspark.sql import functions as F

    from chronon_spark.api import Query
    from chronon_spark.sources.catalog import SNAPSHOT_DIR
    from chronon_spark.sources.scan import scan_df

    wh = committed_wh
    mirror_to_iceberg(wh, "t")
    mirror_to_delta(wh, "t", spark)
    q = Query(start_partition="2024-01-02", end_partition="2024-01-02")

    for keep_dir, drop_dir in (("metadata", "_delta_log"),
                               ("_delta_log", "metadata")):
        loc = wh.path("t") + f"_prune_{keep_dir.strip('_')}"
        shutil.copytree(wh.path("t"), loc)
        shutil.rmtree(os.path.join(loc, SNAPSHOT_DIR))
        shutil.rmtree(os.path.join(loc, drop_dir))
        df = scan_df(spark, loc, q)
        assert _rows(df.select("id", "v", "ds")) == [(3, "c", "2024-01-02")]
        scanned = {r[0] for r in
                   df.select(F.input_file_name()).distinct().collect()}
        assert len(scanned) == 1, f"{keep_dir}: scan not file-pruned"


def test_delta_remirror_idempotent(spark, committed_wh):
    wh = committed_wh
    mirror_to_delta(wh, "t", spark)
    v0_bytes = open(os.path.join(
        wh.path("t"), "_delta_log", "00000000000000000000.json"), "rb").read()
    wh.insert_overwrite(spark.createDataFrame(
        [(7, "q", "2024-01-04")], "id long, v string, ds string"), "t")
    mirror_to_delta(wh, "t", spark)
    dt = DeltaTable(wh.path("t"))
    assert dt.versions() == [0, 1, 2, 3]
    # already-written commits are immutable
    assert open(os.path.join(
        wh.path("t"), "_delta_log",
        "00000000000000000000.json"), "rb").read() == v0_bytes
    assert _rows(dt.read(spark)) == _rows(wh.read("t"))


# ---------------------------------------------------- hardening (r4 review)

def test_avro_truncated_varint_and_bomb_are_typed_errors(monkeypatch):
    """Corrupt containers fail with EOFError/SchemaError, never a bare
    IndexError, and a deflate bomb is cut off at the block budget before
    it can balloon executor memory."""
    import zlib

    import chronon_spark.sources.avro_io as avro_io

    # a varint whose continuation bit runs off the end of the buffer
    with pytest.raises((EOFError, ValueError)):
        read_container(b"Obj\x01" + b"\x80")

    # hand-assemble a deflate container whose one block inflates far past
    # the (monkeypatched) budget
    monkeypatch.setattr(avro_io, "_MAX_BLOCK_BYTES", 1 << 16)
    enc = Encoder()
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "s", "type": "string"}]}
    enc.write_value({"type": "map", "values": "bytes"}, {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"deflate"})
    sync = b"\x01" * 16
    body = Encoder()
    body.write_value(parse_schema(schema), {"s": "x" * (1 << 20)})
    c = zlib.compressobj(9, zlib.DEFLATED, -15)
    payload = c.compress(body.out.getvalue()) + c.flush()
    blk = Encoder()
    blk.write_long(1)
    blk.write_long(len(payload))
    data = (b"Obj\x01" + enc.out.getvalue() + sync
            + blk.out.getvalue() + payload + sync)
    with pytest.raises(ValueError, match="inflates past"):
        read_container(data)


def test_iceberg_metadata_version_sort_is_numeric(tmp_path):
    """v10 must win over v9 when version-hint.text is absent (lexical
    sort would pick v9, read stale state, and the next mirror would then
    OVERWRITE the real v10)."""
    from chronon_spark.sources.iceberg import _load_current_metadata

    root = str(tmp_path / "t")
    meta = os.path.join(root, "metadata")
    os.makedirs(meta)
    for v in range(1, 11):
        with open(os.path.join(meta, f"v{v}.metadata.json"), "w") as fh:
            json.dump({"current-snapshot-id": v}, fh)
    out = _load_current_metadata(root)
    assert out["_version"] == 10
    assert out["current-snapshot-id"] == 10


def test_iceberg_mor_relocated_table_still_applies_deletes(
        spark, tmp_path):
    """Move a merge-on-read table to a new directory: data files resolve
    via _resolve_data, and position/equality deletes must STILL apply
    (the seq-number join has to bridge manifest paths -> resolved paths;
    before the fix every delete silently unapplied on relocated trees)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as papq

    loc = str(tmp_path / "morsrc")
    meta_dir = os.path.join(loc, "metadata")
    os.makedirs(os.path.join(loc, "data"))
    os.makedirs(meta_dir)
    data_path = os.path.join(loc, "data", "d0.parquet")
    papq.write_table(pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                               "v": ["a", "b", "c"]}), data_path)
    pos_path = os.path.join(loc, "data", "pd0.parquet")
    papq.write_table(pa.table({  # pos 0 -> removes id=1
        "file_path": [data_path], "pos": pa.array([0], pa.int64())}),
        pos_path)
    eq_path = os.path.join(loc, "data", "ed0.parquet")
    papq.write_table(pa.table({"id": pa.array([3], pa.int64())}), eq_path)

    entry_schema = manifest_entry_schema(
        [{"name": "ds", "type": "string", "field-id": 1000}])

    def entry(path, content, seq, equality_ids=None, ds="2024-06-01"):
        return {"status": 1, "snapshot_id": 20, "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": content, "file_path": path,
                    "file_format": "PARQUET", "partition": {"ds": ds},
                    "record_count": 1,
                    "file_size_in_bytes": os.path.getsize(path),
                    "value_counts": None, "null_value_counts": None,
                    "lower_bounds": None, "upper_bounds": None,
                    "split_offsets": None, "equality_ids": equality_ids,
                    "sort_order_id": None}}

    dman = os.path.join(meta_dir, "m-data.avro")
    write_container(dman, entry_schema, [entry(data_path, 0, 1)],
                    metadata={"format-version": "2", "content": "data"})
    delman = os.path.join(meta_dir, "m-del.avro")
    write_container(delman, entry_schema, [
        entry(pos_path, 1, 2),
        # GLOBAL equality delete: no partition value (unpartitioned spec)
        entry(eq_path, 2, 2, equality_ids=[1], ds=None),
    ], metadata={"format-version": "2", "content": "deletes"})

    def mlist_row(path, content, seq):
        return {"manifest_path": path,
                "manifest_length": os.path.getsize(path),
                "partition_spec_id": 0, "content": content,
                "sequence_number": seq, "min_sequence_number": 1,
                "added_snapshot_id": 20, "added_files_count": 1,
                "existing_files_count": 0, "deleted_files_count": 0,
                "added_rows_count": 1, "existing_rows_count": 0,
                "deleted_rows_count": 0, "partitions": None,
                "key_metadata": None}

    lpath = os.path.join(meta_dir, "snap-20.avro")
    write_container(lpath, MANIFEST_LIST_SCHEMA,
                    [mlist_row(dman, 0, 1), mlist_row(delman, 1, 2)],
                    metadata={"format-version": "2"})
    md = {
        "format-version": 2, "table-uuid": "2" * 32, "location": loc,
        "last-sequence-number": 2, "last-updated-ms": 1700000000000,
        "last-column-id": 3, "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "string"},
            {"id": 3, "name": "ds", "required": False, "type": "string"},
        ]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "ds", "transform": "identity",
             "source-id": 3, "field-id": 1000}]}],
        "last-partition-id": 1000, "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": 20,
        "snapshots": [{"snapshot-id": 20, "parent-snapshot-id": None,
                       "sequence-number": 2,
                       "timestamp-ms": 1700000000000,
                       "manifest-list": lpath,
                       "summary": {"operation": "overwrite"},
                       "schema-id": 0}],
        "snapshot-log": [], "metadata-log": [], "properties": {},
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    # manifest-list path inside the moved tree also needs resolution: the
    # reader resolves manifests through the same location-tail logic
    loc2 = str(tmp_path / "mordst")
    shutil.move(loc, loc2)

    t = IcebergTable(loc2)
    # id=1 position-deleted, id=3 globally equality-deleted
    assert _rows(t.read(spark)) == [(2, "b", "2024-06-01")]
    # partition_range pruning must keep the GLOBAL delete applicable
    assert _rows(t.read(spark,
                        partition_range=("2024-06-01", "2024-06-01"))) \
        == [(2, "b", "2024-06-01")]


def test_delta_mirror_after_expiry_bootstraps_metadata(spark, tmp_path):
    """expire_snapshots before the FIRST mirror: the earliest written
    Delta version is > 0 and must carry protocol+metaData (otherwise the
    log has no schema anywhere and every read breaks)."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    for i, ds in enumerate(["2024-01-01", "2024-01-02", "2024-01-03"]):
        wh.insert_overwrite(spark.createDataFrame(
            [(i, "x", ds)], "id long, v string, ds string"), "t")
    wh.expire_snapshots("t", retain_last=2, grace_seconds=0)
    mirror_to_delta(wh, "t", spark)
    dt = DeltaTable(wh.path("t"))
    st = dt.state()
    assert st["metaData"] is not None
    assert st["metaData"]["partitionColumns"] == ["ds"]
    assert min(dt.versions()) > 0  # genuinely started past version 0
    assert _rows(dt.read(spark)) == [
        (0, "x", "2024-01-01"), (1, "x", "2024-01-02"),
        (2, "x", "2024-01-03")]


def test_delta_reader_rejects_gaps_columnmapping_multipart(
        spark, tmp_path):
    """Silent-wrong-data guards: a missing commit INSIDE the replay
    range, a column-mapped table, and a multipart checkpoint each raise
    instead of reconstructing broken state."""
    schema_string = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "ds", "type": "string", "nullable": True, "metadata": {}},
    ]})

    def log(loc, versions, config=None):
        os.makedirs(os.path.join(loc, "_delta_log"), exist_ok=True)
        for v in versions:
            actions = [{"commitInfo": {"timestamp": 1700000000000 + v,
                                       "operation": "WRITE"}}]
            if v == min(versions):
                actions += [
                    {"protocol": {"minReaderVersion": 2,
                                  "minWriterVersion": 5}},
                    {"metaData": {"id": "m", "format":
                                  {"provider": "parquet", "options": {}},
                                  "schemaString": schema_string,
                                  "partitionColumns": ["ds"],
                                  "configuration": config or {},
                                  "createdTime": 1}}]
            with open(os.path.join(loc, "_delta_log",
                                   f"{v:020d}.json"), "w") as fh:
                fh.write("\n".join(json.dumps(a) for a in actions) + "\n")

    gap = str(tmp_path / "gap")
    log(gap, [0, 2])  # v1 missing inside the range
    with pytest.raises(ValueError, match="delta log gap"):
        DeltaTable(gap).state()

    cm = str(tmp_path / "cm")
    log(cm, [0], config={"delta.columnMapping.mode": "name"})
    with pytest.raises(ValueError, match="columnMapping"):
        DeltaTable(cm).state()

    mp = str(tmp_path / "mp")
    log(mp, [0, 1])
    open(os.path.join(
        mp, "_delta_log",
        f"{1:020d}.checkpoint.0000000001.0000000002.parquet"),
        "wb").close()
    with pytest.raises(ValueError, match="unsupported checkpoint"):
        DeltaTable(mp).state()


@pytest.mark.parametrize("seed", [29, 17])
def test_wire_mirrors_model_based_random_commits(spark, tmp_path, seed):
    """Randomized commit sequence with mid-sequence expiries landing
    BETWEEN a commit and its mirror (so the rebased baseline may never
    have been mirrored — the interplay that silently resurrected expired
    files before the baseline-reconcile fix), RE-MIRRORED incrementally
    after every step with small checkpoint intervals: both wire-format
    readers must equal the warehouse at every step. Seed 17 is the
    regression seed that originally caught the stale-add bug."""
    import random

    rng = random.Random(seed)
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    all_ds = [f"2024-02-{d:02d}" for d in range(1, 5)]

    def day_rows(commit):
        rows = [(uid, val, ds) for ds, rs in commit.items()
                for uid, val in rs]
        return spark.createDataFrame(rows, "id long, v double, ds string")

    for step in range(6):
        commit = {
            ds: [(rng.randint(0, 99), float(rng.randint(0, 1000)))
                 for _ in range(rng.randint(1, 3))]
            for ds in rng.sample(all_ds, rng.randint(1, 2))
        }
        wh.insert_overwrite(day_rows(commit), "m")
        if step == rng.randint(2, 4):
            wh.expire_snapshots(
                "m", retain_last=rng.randint(1, 3), grace_seconds=0)
        mirror_to_iceberg(wh, "m")
        mirror_to_delta(wh, "m", spark,
                        checkpoint_interval=rng.choice([2, 3]))
        want = _rows(wh.read("m"))
        assert _rows(IcebergTable(wh.path("m")).read(spark)) == want, step
        dt = DeltaTable(wh.path("m"))
        assert _rows(dt.read(spark)) == want, step
        # reader-side contiguity contract holds at every version we read
        assert _rows(dt.read(spark, version=dt.latest_version())) == want
