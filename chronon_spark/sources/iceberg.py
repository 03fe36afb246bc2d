"""Real Iceberg table-format metadata (spec v2), from scratch.

The snapshot-log warehouse (catalog.py) reproduces Iceberg's SEMANTICS
(time travel, incremental scans, optimistic commits, expiry) on a JSON
log; the remaining gap the round-3 review called out was the WIRE
FORMAT. This module closes it using only the public Iceberg table spec
(https://iceberg.apache.org/spec/, format-version 2):

* ``metadata/v{N}.metadata.json`` — table metadata: schemas, identity
  partition spec on the ds column, the snapshot list (each with
  sequence number, parent, summary and manifest-list path),
  snapshot-log and metadata-log, ``version-hint.text``;
* ``metadata/snap-{id}-1-{uuid}.avro`` — the manifest LIST: one
  ``manifest_file`` record per manifest with the spec's field ids
  (500-519), content/sequence-number/added-counts/partition summaries;
* ``metadata/{uuid}-m0.avro`` — the manifest: ``manifest_entry``
  records (status / snapshot_id / sequence numbers / ``data_file`` r2
  with field ids 100-146), file paths, identity partition tuple,
  record counts and file sizes, value-count stats.

Both sides are exercised: ``mirror_to_iceberg`` renders a warehouse
table's commit log as real Iceberg metadata (one manifest per snapshot
carrying added entries for that commit's files and existing entries for
carried-over live files — spec-valid, favoring simplicity over Iceberg's
manifest-reuse optimization, which is a metadata-size trade not a
correctness one), and ``IcebergTable`` reads any spec-conformant v2
metadata tree — current state, ``VERSION AS OF`` / ``TIMESTAMP AS OF``
time travel, incremental added-files scans between snapshots, and
partition listing from manifests alone (the ``.partitions`` metadata
table the reference queries; Iceberg.scala:21-85) — never touching data
files for planning.

Avro containers come from the from-scratch codec in avro_io.py (no Avro
wheel in the container). Reference parity: the reference's Iceberg
support lives behind the Java runtime jar
(/root/reference/spark/src/main/scala/ai/chronon/spark/catalog/Iceberg.scala);
this is the same contract carried by the metadata files themselves.
"""

from __future__ import annotations

import json
import os
import time
import uuid as uuid_mod
from typing import Any, Optional

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from chronon_spark.sources.avro_io import read_container, write_container

# ------------------------------------------------------------ schemas
# Avro schemas for manifest-list and manifest files, field ids per the
# Iceberg spec's "Manifests" and "Manifest Lists" tables.

FIELD_SUMMARY = {
    "type": "record", "name": "r508", "fields": [
        {"name": "contains_null", "type": "boolean", "field-id": 509},
        {"name": "contains_nan", "type": ["null", "boolean"],
         "default": None, "field-id": 518},
        {"name": "lower_bound", "type": ["null", "bytes"],
         "default": None, "field-id": 510},
        {"name": "upper_bound", "type": ["null", "bytes"],
         "default": None, "field-id": 511},
    ],
}

MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {"name": "partitions",
         "type": ["null", {"type": "array", "items": FIELD_SUMMARY}],
         "default": None, "field-id": 507},
        {"name": "key_metadata", "type": ["null", "bytes"],
         "default": None, "field-id": 519},
    ],
}


def manifest_entry_schema(partition_fields: list[dict]) -> dict:
    """``manifest_entry`` Avro schema for an identity-partitioned data
    manifest. `partition_fields` = [{"name": ds, "type": avro type,
    "field-id": 1000+i}] — the r102 partition tuple."""
    # Iceberg's int-keyed maps are Avro ARRAYS of key/value records
    # (Avro maps only allow string keys), spec names like k109_v110
    def int_map(kid: int, vid: int, vtype: str) -> dict:
        return {"type": "array", "logicalType": "map",
                "items": {"type": "record", "name": f"k{kid}_v{vid}",
                          "fields": [
                              {"name": "key", "type": "int", "field-id": kid},
                              {"name": "value", "type": vtype,
                               "field-id": vid}]}}
    data_file = {
        "type": "record", "name": "r2", "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "type": {
                "type": "record", "name": "r102",
                "fields": [
                    {"name": f["name"],
                     "type": ["null", f["type"]],
                     "default": None, "field-id": f["field-id"]}
                    for f in partition_fields
                ]}, "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {"name": "value_counts",
             "type": ["null", int_map(119, 120, "long")],
             "default": None, "field-id": 109},
            {"name": "null_value_counts",
             "type": ["null", int_map(121, 122, "long")],
             "default": None, "field-id": 110},
            {"name": "lower_bounds",
             "type": ["null", int_map(126, 127, "bytes")],
             "default": None, "field-id": 125},
            {"name": "upper_bounds",
             "type": ["null", int_map(129, 130, "bytes")],
             "default": None, "field-id": 128},
            {"name": "split_offsets",
             "type": ["null", {"type": "array", "items": "long"}],
             "default": None, "field-id": 132},
            {"name": "equality_ids",
             "type": ["null", {"type": "array", "items": "int"}],
             "default": None, "field-id": 135},
            {"name": "sort_order_id", "type": ["null", "int"],
             "default": None, "field-id": 140},
        ],
    }
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 4},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


# -------------------------------------------------- type translation

_ARROW_TO_ICEBERG = {
    "string": "string", "large_string": "string",
    "int8": "int", "int16": "int", "int32": "int", "uint8": "int",
    "uint16": "int", "int64": "long", "uint32": "long",
    "float": "float", "halffloat": "float", "double": "double",
    "bool": "boolean", "binary": "binary", "large_binary": "binary",
    "date32[day]": "date",
}

_ICEBERG_TO_AVRO = {"string": "string", "int": "int", "long": "long",
                    "float": "float", "double": "double",
                    "boolean": "boolean", "binary": "bytes",
                    "date": "int"}


class _IdGen:
    def __init__(self) -> None:
        self.n = 0

    def __call__(self) -> int:
        self.n += 1
        return self.n


def _arrow_field_type(t: Any, ids: _IdGen) -> Any:
    s = str(t)
    if s in _ARROW_TO_ICEBERG:
        return _ARROW_TO_ICEBERG[s]
    if s.startswith("timestamp"):
        return "timestamptz" if getattr(t, "tz", None) else "timestamp"
    if s.startswith("decimal"):
        return f"decimal({t.precision}, {t.scale})"
    if s.startswith(("list", "large_list")):
        return {"type": "list", "element-id": ids(),
                "element": _arrow_field_type(t.value_type, ids),
                "element-required": False}
    if s.startswith("struct"):
        return {"type": "struct", "fields": [
            {"id": ids(), "name": f.name, "required": False,
             "type": _arrow_field_type(f.type, ids)}
            for f in t]}
    if s.startswith("map"):
        return {"type": "map", "key-id": ids(),
                "key": _arrow_field_type(t.key_type, ids),
                "value-id": ids(),
                "value": _arrow_field_type(t.item_type, ids),
                "value-required": False}
    raise ValueError(f"no Iceberg mapping for arrow type {s}")


def iceberg_schema_from_parquet(sample_file: str,
                                ds_col: Optional[str] = None) -> dict:
    """Iceberg schema JSON from a data file's parquet footer — the
    mirror never needs a SparkSession for metadata work. Hive-layout
    data files omit the partition column (it lives in the path), but the
    Iceberg schema must carry it (the partition spec's source-id points
    at it), so `ds_col` is appended when absent."""
    arrow = pq.read_schema(sample_file)
    ids = _IdGen()
    fields = []
    for f in arrow:
        fid = ids()
        fields.append({"id": fid, "name": f.name, "required": False,
                       "type": _arrow_field_type(f.type, ids)})
    if ds_col and ds_col not in {f["name"] for f in fields}:
        fields.append({"id": ids(), "name": ds_col, "required": False,
                       "type": "string"})
    return {"type": "struct", "schema-id": 0, "fields": fields,
            "_last_column_id": ids.n}


# ------------------------------------------------------------ writer

def mirror_to_iceberg(warehouse, table: str) -> str:
    """Render a warehouse table's snapshot log as real Iceberg v2
    metadata under ``<table>/metadata/``. Incremental and idempotent:
    snapshots already mirrored are kept (their manifest files are
    immutable, like Iceberg's own); each call appends the missing ones
    and writes one new ``v{N}.metadata.json`` + ``version-hint.text``.
    Returns the path of the current metadata file."""
    snaps = warehouse.snapshots(table)
    if not snaps:
        raise ValueError(f"{table} has no snapshot log to mirror")
    root = warehouse.path(table)
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    ds_col = warehouse.spec.column

    prior = _load_current_metadata(root)
    version = (prior.get("_version", 0) if prior else 0) + 1
    done_ids = ({s["snapshot-id"] for s in prior.get("snapshots", [])}
                if prior else set())
    rebased = prior is not None and not done_ids <= {
        s["snapshot_id"] for s in snaps}
    if rebased:
        # expire_snapshots rebased the internal log: expired snapshots
        # must leave the Iceberg metadata too (their data files are
        # GC'd), so rebuild the snapshot list from the current log —
        # exactly what Iceberg's own expireSnapshots does to metadata.
        # The metadata-log still chains to the prior file for audit.
        done_ids = set()

    # replay the internal log to know each snapshot's live set and each
    # file's adding snapshot (for existing-entry provenance)
    live: set[str] = set()
    added_by: dict[str, int] = {}
    sample = None
    ice_snaps = list(prior.get("snapshots", [])) if prior and not rebased else []
    snap_log = list(prior.get("snapshot-log", [])) if prior and not rebased else []
    now_ms = int(time.time() * 1000)
    schema = None
    schemas: list[dict] = []
    if prior:
        # continue the prior schema lineage even across an expiry
        # rebuild — field ids are forever
        schemas = [dict(s) for s in prior.get("schemas", [])]
        schema = dict(schemas[-1])
        schema["_last_column_id"] = prior["last-column-id"]
        schemas[-1] = schema

    def _evolve_schema(snapshot: dict) -> None:
        """Additive schema evolution (the backfill flow's additive-change
        contract): a commit whose newest file carries columns the current
        schema lacks appends a NEW schema version — existing field ids
        are immutable, new fields get fresh ids, current-schema-id
        advances. Removals/renames are out of scope (the engine never
        produces them)."""
        nonlocal schema
        if not snapshot["added_files"]:
            return
        newest = os.path.join(root, sorted(snapshot["added_files"])[-1])
        if schema is None:
            schema = iceberg_schema_from_parquet(newest, ds_col)
            schemas.append(schema)
            return
        known = {f["name"] for f in schema["fields"]}
        arrow = pq.read_schema(newest)
        new_fields = [f for f in arrow if f.name not in known]
        if not new_fields:
            return
        ids = _IdGen()
        ids.n = schema["_last_column_id"]
        fields = [dict(f) for f in schema["fields"]]
        for f in new_fields:
            fid = ids()
            fields.append({"id": fid, "name": f.name, "required": False,
                           "type": _arrow_field_type(f.type, ids)})
        schema = {"type": "struct", "schema-id": len(schemas),
                  "fields": fields, "_last_column_id": ids.n}
        schemas.append(schema)

    entry_schema = manifest_entry_schema(
        [{"name": ds_col, "type": "string", "field-id": 1000}])

    stat_cache: dict[str, tuple] = {}  # relpath -> (rows, bytes, colstats)

    def _stats(relpath: str) -> tuple:
        # data files are immutable once committed, so footer stats are
        # memoized across snapshots — O(files) reads per mirror call, not
        # O(snapshots x files)
        if relpath not in stat_cache:
            full = os.path.join(root, relpath)
            meta = pq.read_metadata(full)
            cols = (_file_column_stats(meta, schema)
                    if schema is not None else
                    {"value_counts": None, "null_value_counts": None,
                     "lower_bounds": None, "upper_bounds": None})
            stat_cache[relpath] = (meta.num_rows, os.path.getsize(full), cols)
        return stat_cache[relpath]

    for s in snaps:
        sid = s["snapshot_id"]
        seq = sid  # internal ids are 1..N in commit order
        for f in s["added_files"]:
            added_by[f] = sid
        live.update(s["added_files"])
        live.difference_update(s["removed_files"])
        if sid in done_ids:
            continue
        files = sorted(live)
        if files and sample is None:
            sample = os.path.join(root, files[0])
        _evolve_schema(s)

        entries, parts = [], set()
        added_n = added_rows = existing_n = existing_rows = 0
        for f in files:
            full = os.path.join(root, f)
            nrows, fsize, colstats = _stats(f)
            ds = warehouse._partition_of(f)
            parts.add(ds)
            is_new = f in s["added_files"]
            entries.append({
                "status": 1 if is_new else 0,
                "snapshot_id": added_by.get(f, sid),
                "sequence_number": None if is_new else added_by.get(f, sid),
                "file_sequence_number": None if is_new else added_by.get(f, sid),
                "data_file": {
                    "content": 0,
                    "file_path": full,
                    "file_format": "PARQUET",
                    "partition": {ds_col: ds},
                    "record_count": nrows,
                    "file_size_in_bytes": fsize,
                    **colstats,
                    "split_offsets": None, "equality_ids": None,
                    "sort_order_id": None,
                },
            })
            if is_new:
                added_n, added_rows = added_n + 1, added_rows + nrows
            else:
                existing_n, existing_rows = existing_n + 1, existing_rows + nrows

        # seeded with the metadata version too: a rebuild after log
        # rebase must not overwrite manifests older metadata references
        muuid = uuid_mod.uuid5(uuid_mod.NAMESPACE_URL,
                               f"{table}/m/{sid}/{version}")
        mpath = os.path.join(meta_dir, f"{muuid}-m0.avro")
        write_container(
            mpath, entry_schema, entries,
            metadata={
                "schema": json.dumps(_strip_internal(schema or {})),
                "schema-id": "0",
                "partition-spec": json.dumps([{
                    "name": ds_col, "transform": "identity",
                    "source-id": _ds_source_id(schema, ds_col),
                    "field-id": 1000}]),
                "partition-spec-id": "0",
                "format-version": "2",
                "content": "data",
            })
        min_seq = min((added_by.get(f, sid) for f in files), default=seq)
        part_summaries = [{
            "contains_null": False, "contains_nan": False,
            "lower_bound": min(parts).encode() if parts else None,
            "upper_bound": max(parts).encode() if parts else None,
        }]
        lpath = os.path.join(
            meta_dir,
            f"snap-{sid}-1-"
            f"{uuid_mod.uuid5(uuid_mod.NAMESPACE_URL, f'{table}/l/{sid}/{version}')}.avro")
        write_container(
            lpath, MANIFEST_LIST_SCHEMA, [{
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": min_seq,
                "added_snapshot_id": sid,
                "added_files_count": added_n,
                "existing_files_count": existing_n,
                "deleted_files_count": 0,
                "added_rows_count": added_rows,
                "existing_rows_count": existing_rows,
                "deleted_rows_count": 0,
                "partitions": part_summaries,
                "key_metadata": None,
            }],
            metadata={"format-version": "2"})
        ice_snaps.append({
            "snapshot-id": sid,
            "parent-snapshot-id": s["parent_id"],
            "sequence-number": seq,
            "timestamp-ms": now_ms,
            "manifest-list": lpath,
            "summary": {"operation": "overwrite"
                        if s["removed_files"] else "append",
                        "chronon-operation": s["operation"]},
            "schema-id": schema["schema-id"] if schema else 0,
        })
        snap_log.append({"timestamp-ms": now_ms, "snapshot-id": sid})

    if schema is None:
        if sample is None:
            sample = os.path.join(root, sorted(live)[0])
        schema = iceberg_schema_from_parquet(sample, ds_col)
        schemas.append(schema)

    metadata = {
        "format-version": 2,
        "table-uuid": str(uuid_mod.uuid5(uuid_mod.NAMESPACE_URL, table)),
        "location": root,
        "last-sequence-number": snaps[-1]["snapshot_id"],
        "last-updated-ms": now_ms,
        "last-column-id": schema["_last_column_id"],
        "current-schema-id": schema["schema-id"],
        "schemas": [_strip_internal(s) for s in schemas],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [{
            "name": ds_col, "transform": "identity",
            "source-id": _ds_source_id(schema, ds_col), "field-id": 1000}]}],
        "last-partition-id": 1000,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": ice_snaps[-1]["snapshot-id"],
        "snapshots": ice_snaps,
        "snapshot-log": snap_log,
        "metadata-log": (prior.get("metadata-log", []) +
                         [{"timestamp-ms": now_ms,
                           "metadata-file": prior["_path"]}]
                         if prior else []),
        "properties": {"write.format.default": "parquet"},
    }
    mfile = os.path.join(meta_dir, f"v{version}.metadata.json")
    with open(mfile, "w") as fh:
        json.dump(metadata, fh, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(version))
    return mfile


def _strip_internal(schema: dict) -> dict:
    return {k: v for k, v in schema.items() if not k.startswith("_")}


# ---- Appendix D single-value serialization (column bound encoding) ----

_BOUND_PACK = {"int": "<i", "long": "<q", "float": "<f", "double": "<d",
               "date": "<i"}


def encode_bound(ice_type: str, value: Any) -> Optional[bytes]:
    """Iceberg Appendix D single-value binary form for manifest
    lower/upper bounds; None for types without a defined/needed bound
    encoding here (binary, nested)."""
    import struct as _struct
    if value is None:
        return None
    if ice_type == "date" and hasattr(value, "toordinal"):
        import datetime
        value = (value - datetime.date(1970, 1, 1)).days
    if ice_type in _BOUND_PACK:
        return _struct.pack(_BOUND_PACK[ice_type], value)
    if ice_type == "boolean":
        return b"\x01" if value else b"\x00"
    if ice_type == "string":
        return str(value).encode("utf-8")
    return None


def decode_bound(ice_type: str, raw: Optional[bytes]) -> Any:
    import struct as _struct
    if raw is None:
        return None
    if ice_type in _BOUND_PACK:
        return _struct.unpack(_BOUND_PACK[ice_type], raw)[0]
    if ice_type == "boolean":
        return raw != b"\x00"
    if ice_type == "string":
        return raw.decode("utf-8")
    return None


def _file_column_stats(pf_meta, schema: dict) -> dict:
    """value/null counts + Appendix-D bounds per field id, from the
    parquet footer (no data scan): rowgroup stats aggregated across the
    file; columns with absent footer stats are skipped, never guessed."""
    name_to = {f["name"]: (f["id"], f["type"]) for f in schema["fields"]
               if isinstance(f["type"], str)}
    value_counts: dict[int, int] = {}
    null_counts: dict[int, int] = {}
    mins: dict[int, Any] = {}
    maxs: dict[int, Any] = {}
    types: dict[int, str] = {}
    no_nulls: set[int] = set()   # columns lacking null stats in SOME rowgroup
    no_bounds: set[int] = set()  # ditto min/max — partial aggregates are wrong
    for rg in range(pf_meta.num_row_groups):
        row_group = pf_meta.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if name not in name_to:
                continue
            fid, ice_type = name_to[name]
            types[fid] = ice_type
            value_counts[fid] = value_counts.get(fid, 0) + col.num_values
            st = col.statistics
            if st is None or not st.has_null_count:
                no_nulls.add(fid)
            else:
                null_counts[fid] = null_counts.get(fid, 0) + st.null_count
            if st is None or not st.has_min_max:
                no_bounds.add(fid)
            else:
                v_min, v_max = st.min, st.max
                mins[fid] = v_min if fid not in mins else min(mins[fid], v_min)
                maxs[fid] = v_max if fid not in maxs else max(maxs[fid], v_max)
    lowers: dict[int, bytes] = {}
    uppers: dict[int, bytes] = {}
    for fid in mins:
        if fid in no_bounds:
            continue
        lo = encode_bound(types[fid], mins[fid])
        hi = encode_bound(types[fid], maxs[fid])
        if lo is not None and hi is not None:
            lowers[fid], uppers[fid] = lo, hi
    null_counts = {k: v for k, v in null_counts.items() if k not in no_nulls}

    def kv(d: dict) -> Optional[list]:
        return [{"key": k, "value": d[k]} for k in sorted(d)] or None

    return {"value_counts": kv(value_counts),
            "null_value_counts": kv(null_counts),
            "lower_bounds": kv(lowers),
            "upper_bounds": kv(uppers)}


def _ds_source_id(schema: Optional[dict], ds_col: str) -> int:
    for f in (schema or {}).get("fields", []):
        if f["name"] == ds_col:
            return f["id"]
    return 1


def _load_current_metadata(root: str) -> Optional[dict]:
    meta_dir = os.path.join(root, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as fh:
            v = int(fh.read().strip())
        path = os.path.join(meta_dir, f"v{v}.metadata.json")
    else:
        if not os.path.isdir(meta_dir):
            return None
        # numeric sort: lexical would pick v9 over v10+, silently reading
        # a stale snapshot and then OVERWRITING v10 on the next mirror
        versions = sorted(
            (f for f in os.listdir(meta_dir)
             if f.startswith("v") and f.endswith(".metadata.json")),
            key=lambda f: int(f[1:].split(".")[0]))
        if not versions:
            return None
        path = os.path.join(meta_dir, versions[-1])
        v = int(os.path.basename(path).split(".")[0][1:])
    with open(path) as fh:
        out = json.load(fh)
    out["_version"], out["_path"] = v, path
    return out


# ------------------------------------------------------------ reader

class IcebergTable:
    """Reader over a spec-v2 Iceberg metadata tree. All planning —
    snapshot selection, file listing, partition listing, incremental
    diffs — comes from metadata alone; data files are only touched by
    the returned Spark scan."""

    def __init__(self, location: str):
        self.location = location
        meta = _load_current_metadata(location)
        if meta is None:
            raise FileNotFoundError(f"no Iceberg metadata under {location}")
        self.metadata = meta

    # -- snapshot selection

    def snapshots(self) -> list[dict]:
        return self.metadata["snapshots"]

    def current_snapshot_id(self) -> int:
        return self.metadata["current-snapshot-id"]

    def _snapshot(self, snapshot_id: Optional[int] = None,
                  as_of_ms: Optional[int] = None) -> dict:
        snaps = {s["snapshot-id"]: s for s in self.snapshots()}
        if snapshot_id is None and as_of_ms is not None:
            eligible = [e for e in self.metadata.get("snapshot-log", [])
                        if e["timestamp-ms"] <= as_of_ms]
            if not eligible:
                raise ValueError(f"no snapshot at or before {as_of_ms}")
            snapshot_id = eligible[-1]["snapshot-id"]
        if snapshot_id is None:
            snapshot_id = self.current_snapshot_id()
        if snapshot_id not in snaps:
            raise ValueError(f"unknown or expired snapshot {snapshot_id}")
        return snaps[snapshot_id]

    # -- manifest walking

    def _resolve(self, path: str) -> str:
        if os.path.isabs(path) and os.path.exists(path):
            return path
        # relocated table: retarget under the current location
        tail = path.split("/metadata/")[-1]
        cand = os.path.join(self.location, "metadata", tail)
        return cand if os.path.exists(cand) else path

    def _entries(self, snapshot: dict,
                 statuses: tuple[int, ...] = (0, 1),
                 content: int = 0) -> list[dict]:
        """Live manifest entries of one manifest content kind (0 = data,
        1 = deletes), each with the v2 sequence-number inheritance
        applied: a null sequence_number on an ADDED entry inherits the
        manifest's sequence_number."""
        _, _, manifests = read_container(
            self._resolve(snapshot["manifest-list"]))
        out = []
        for m in manifests:
            if m.get("content", 0) != content:
                continue
            _, _, entries = read_container(self._resolve(m["manifest_path"]))
            for e in entries:
                if e["status"] not in statuses:
                    continue
                if e.get("sequence_number") is None:
                    e["sequence_number"] = m.get("sequence_number", 0)
                out.append(e)
        return out

    def files(self, snapshot_id: Optional[int] = None,
              as_of_ms: Optional[int] = None) -> list[dict]:
        """Live ``data_file`` records at a snapshot (current by default,
        or VERSION AS OF / TIMESTAMP AS OF)."""
        snap = self._snapshot(snapshot_id, as_of_ms)
        return [e["data_file"] for e in self._entries(snap)]

    def delete_entries(self, snapshot_id: Optional[int] = None,
                       as_of_ms: Optional[int] = None) -> list[dict]:
        """Live delete-manifest entries (merge-on-read tables): each
        entry's data_file.content is 1 (position deletes) or 2 (equality
        deletes), with resolved sequence numbers."""
        snap = self._snapshot(snapshot_id, as_of_ms)
        return self._entries(snap, content=1)

    def partitions(self) -> list[str]:
        """Distinct partition values from manifests alone — the
        ``.partitions`` metadata-table analog the reference queries.
        Null partition values (legal per spec) are omitted, matching
        DeltaTable.partitions()."""
        ds_col = self._ds_col()
        if ds_col is None:
            return []
        return sorted(
            {f["partition"].get(ds_col) for f in self.files()} - {None})

    def _ds_col(self) -> Optional[str]:
        """Leading partition-field name, or None for an unpartitioned
        table (spec-conformant v2 tables may carry an empty fields list)."""
        specs = self.metadata.get("partition-specs") or []
        fields = (specs[0].get("fields") or []) if specs else []
        return fields[0]["name"] if fields else None

    def _current_schema(self) -> dict:
        sid = self.metadata.get("current-schema-id", 0)
        return next(s for s in self.metadata["schemas"]
                    if s.get("schema-id", 0) == sid)

    def _spark_read_schema(self, exclude: set):
        """Spark StructType of the CURRENT table schema (minus hive
        partition columns recovered from metadata). Reading with an
        explicit schema is what Iceberg itself does: files written under
        older schema versions return null for later columns, and no
        footer has to be opened for inference — at a million files,
        mergeSchema-style inference is a full metadata scan."""
        from pyspark.sql import types as T

        prim = {"string": T.StringType(), "long": T.LongType(),
                "int": T.IntegerType(), "double": T.DoubleType(),
                "float": T.FloatType(), "boolean": T.BooleanType(),
                "binary": T.BinaryType(), "date": T.DateType(),
                "timestamp": T.TimestampNTZType(),
                "timestamptz": T.TimestampType()}

        def conv(t):
            if isinstance(t, str):
                if t in prim:
                    return prim[t]
                if t.startswith("decimal"):
                    p, s = t[t.index("(") + 1:-1].split(",")
                    return T.DecimalType(int(p), int(s))
                raise ValueError(f"no Spark mapping for iceberg type {t}")
            if t["type"] == "list":
                return T.ArrayType(conv(t["element"]), True)
            if t["type"] == "struct":
                return T.StructType([
                    T.StructField(f["name"], conv(f["type"]), True)
                    for f in t["fields"]])
            if t["type"] == "map":
                return T.MapType(conv(t["key"]), conv(t["value"]), True)
            raise ValueError(f"no Spark mapping for {t}")

        return T.StructType([
            T.StructField(f["name"], conv(f["type"]), True)
            for f in self._current_schema()["fields"]
            if f["name"] not in exclude])

    def incremental_files(self, from_snapshot_id: int,
                          to_snapshot_id: int) -> list[dict]:
        """data_file records ADDED by snapshots in (from, to] — the
        appendsBetween / incremental-scan primitive."""
        out = []
        for s in self.snapshots():
            if from_snapshot_id < s["snapshot-id"] <= to_snapshot_id:
                out.extend(
                    e["data_file"] for e in self._entries(s, statuses=(1,))
                    if e["snapshot_id"] in (None, s["snapshot-id"]))
        return out

    # -- spark scans

    def _scan(self, spark: SparkSession, files: list[dict],
              with_meta: bool = False) -> DataFrame:
        ds_col = self._ds_col()
        paths = [self._resolve_data(f["file_path"]) for f in files]
        if not paths:
            # preserve schema (incl. recovered ds) via the full scan
            full = self.files()
            if not full:
                raise ValueError("empty table: no files at current snapshot")
            return self._scan(spark, full, with_meta).limit(0)
        df = spark.read.schema(
            self._spark_read_schema({ds_col})).parquet(*paths)
        if with_meta:
            # capture the hidden _metadata columns BEFORE any join (the
            # ds-recovery broadcast join makes them unresolvable): Spark's
            # per-file row ordinal is exactly Iceberg's position-delete pos
            from pyspark.sql import functions as F
            stripped = F.regexp_replace(F.col("_metadata.file_path"),
                                        "^[a-z][a-z0-9+.-]*:(//)?", "")
            df = df.select(
                "*",
                # _metadata.file_path is URI-encoded; seq_map keys are raw
                F.coalesce(F.try_url_decode(stripped),
                           stripped).alias("__fp"),
                F.col("_metadata.row_index").alias("__pos"))
        if ds_col is not None and ds_col not in df.columns:
            # hive-layout tables carry ds only in the path; recover it
            # from the manifests' partition tuples per file
            from chronon_spark.sources.catalog import recover_partition_column
            df = recover_partition_column(
                df, {self._resolve_data(f["file_path"]):
                     f["partition"].get(ds_col) for f in files}, ds_col)
        return df

    def _resolve_data(self, path: str) -> str:
        if os.path.exists(path):
            return path
        tail = path.split(self.metadata["location"].rstrip("/") + "/")[-1]
        cand = os.path.join(self.location, tail)
        return cand if os.path.exists(cand) else path

    def read(self, spark: SparkSession, snapshot_id: Optional[int] = None,
             as_of_ms: Optional[int] = None,
             partition_range: Optional[tuple] = None) -> DataFrame:
        """`partition_range` = (start, end) inclusive bounds on the
        identity partition value (either side None = unbounded): files
        outside the range are dropped FROM THE PLAN using manifest
        partition tuples alone — metadata partition pruning, so a 7-day
        scan of a million-file table never enumerates the other files
        into the Spark scan."""
        snap = self._snapshot(snapshot_id, as_of_ms)
        data_entries = self._entries(snap)
        dels = self._entries(snap, content=1)
        if partition_range is not None:
            ds_col = self._ds_col()
            if ds_col is None:
                raise ValueError(
                    "partition_range requires an identity-partitioned "
                    "table; this table's partition spec is empty")
            lo, hi = partition_range

            def in_range(v):
                return (v is not None and (lo is None or v >= lo)
                        and (hi is None or v <= hi))

            # data: identity partitioning means a file's partition value
            # IS its rows' ds, so out-of-range (incl. null) files drop.
            # deletes: an entry with no partition value is GLOBAL (written
            # under an unpartitioned spec) and applies to every kept file
            # — dropping it would silently resurrect deleted rows.
            data_entries = [
                e for e in data_entries
                if in_range(e["data_file"]["partition"].get(ds_col))]
            dels = [
                e for e in dels
                if (v := e["data_file"]["partition"].get(ds_col)) is None
                or in_range(v)]
        df = self._scan(spark, [e["data_file"] for e in data_entries],
                        with_meta=bool(dels))
        if dels:
            df = self._apply_deletes(spark, df, data_entries, dels)
        return df

    @staticmethod
    def _norm(path: str) -> str:
        import re
        return re.sub(r"^[a-z][a-z0-9+.-]*:(//)?", "", path)

    def _apply_deletes(self, spark: SparkSession, df: DataFrame,
                       data_entries: list[dict],
                       delete_entries: list[dict]) -> DataFrame:
        """Merge-on-read (spec v2 row-level deletes), Spark-native:

        * POSITION deletes (content=1: rows of (file_path, pos)) apply to
          a data file when delete_seq >= data_seq — an anti-join on
          (``_metadata.file_path``, ``_metadata.row_index``), Spark's
          per-file row ordinal being exactly Iceberg's ``pos``;
        * EQUALITY deletes (content=2: rows of the ``equality_ids``
          columns) apply STRICTLY AFTER the data file's sequence number —
          a null-safe anti-join on those columns plus data_seq < del_seq.

        All joins carry the sequence numbers as plan-side columns; no
        driver-side row work. The engine's own writer is copy-on-write
        (insert_overwrite), so this path exists to READ external
        merge-on-read tables."""
        from pyspark.sql import functions as F

        def strip(col):
            return F.regexp_replace(col, "^[a-z][a-z0-9+.-]*:(//)?", "")

        # two path domains: df.__fp carries RESOLVED paths (the scan reads
        # relocated copies through _resolve_data) while manifests and the
        # file_path column INSIDE position-delete files carry the original
        # written paths. seq_map maps both — joining on the wrong domain
        # silently unapplies every delete on a relocated table.
        seq_map = spark.createDataFrame(
            [(self._norm(e["data_file"]["file_path"]),
              self._norm(self._resolve_data(e["data_file"]["file_path"])),
              e["sequence_number"])
             for e in data_entries], "__orig string, __fp string, __dseq long")
        df = df.join(F.broadcast(seq_map.select("__fp", "__dseq")),
                     "__fp", "left")

        pos = [e for e in delete_entries if e["data_file"]["content"] == 1]
        if pos:
            parts = [
                spark.read.parquet(
                    self._resolve_data(e["data_file"]["file_path"]))
                .select(strip(F.col("file_path")).alias("__orig"),
                        F.col("pos").alias("__pos"),
                        F.lit(e["sequence_number"]).alias("__delseq"))
                for e in pos
            ]
            pdel = parts[0]
            for p in parts[1:]:
                pdel = pdel.unionByName(p)
            pdel = (pdel.join(F.broadcast(seq_map), "__orig")
                    .where(F.col("__delseq") >= F.col("__dseq"))
                    .select("__fp", "__pos"))
            df = df.join(pdel, ["__fp", "__pos"], "left_anti")

        eq = [e for e in delete_entries if e["data_file"]["content"] == 2]
        if eq:
            sid = self.metadata.get("current-schema-id", 0)
            schema = next(s for s in self.metadata["schemas"]
                          if s.get("schema-id", 0) == sid)
            id2name = {f["id"]: f["name"] for f in schema["fields"]}
            for e in eq:
                cols = [id2name[i] for i in e["data_file"]["equality_ids"]]
                dele = (spark.read.parquet(
                            self._resolve_data(e["data_file"]["file_path"]))
                        .select(*cols).dropDuplicates()
                        .withColumn("__delseq",
                                    F.lit(e["sequence_number"])))
                cond = [df[c].eqNullSafe(dele[c]) for c in cols]
                cond.append(df["__dseq"] < dele["__delseq"])
                from functools import reduce
                df = df.join(F.broadcast(dele),
                             reduce(lambda a, b: a & b, cond), "left_anti")

        return df.drop("__fp", "__pos", "__dseq")

    def read_incremental(self, spark: SparkSession, from_snapshot_id: int,
                         to_snapshot_id: int) -> DataFrame:
        return self._scan(
            spark, self.incremental_files(from_snapshot_id, to_snapshot_id))
