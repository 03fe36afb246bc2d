"""Delta Lake transaction-log provider (public protocol), from scratch.

The reference ships a Delta format provider behind the delta-spark jar
(/root/reference/spark/src/main/scala/ai/chronon/spark/catalog/DeltaLake.scala);
this container has no Delta artifacts, so this module implements the
public Delta transaction protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md) directly:

* ``_delta_log/{version:020d}.json`` — newline-delimited action files:
  ``protocol`` / ``metaData`` (schemaString in Spark JSON form,
  partitionColumns) / ``add`` (path, partitionValues, size,
  modificationTime, dataChange) / ``remove`` / ``commitInfo``;
* ``{version:020d}.checkpoint.parquet`` + ``_last_checkpoint`` — the
  compacted state (one row per action, struct columns add / remove /
  metaData / protocol), written every ``checkpoint_interval`` commits so
  readers replay O(interval) JSON files instead of the whole log;
* state reconstruction — replay adds/removes keyed on path (last action
  wins), exactly the protocol's state machine; ``VERSION AS OF`` and
  ``TIMESTAMP AS OF`` time travel; CDF-style incremental added-file
  scans between versions.

``mirror_to_delta`` renders a warehouse table's snapshot log as a real
Delta log (internal snapshot N -> Delta version N-1, since Delta
versions are 0-based); ``DeltaTable`` reads any conformant log. The
checkpoint is written with pyarrow on the driver — the log is metadata
(KBs per commit), never data-plane.
"""

from __future__ import annotations

import json
import os
import time
import uuid as uuid_mod
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

LOG_DIR = "_delta_log"


# ------------------------------------------------------------ writer

def _spark_schema_string(spark: SparkSession, sample: str,
                         ds_col: str) -> str:
    """Spark-JSON schemaString for metaData, with the hive-partition
    column appended (Delta carries partition columns in the schema)."""
    df = spark.read.parquet(sample)
    fields = json.loads(df.schema.json())["fields"]
    if ds_col not in {f["name"] for f in fields}:
        fields.append({"name": ds_col, "type": "string",
                       "nullable": True, "metadata": {}})
    return json.dumps({"type": "struct", "fields": fields})


def mirror_to_delta(warehouse, table: str, spark: SparkSession,
                    checkpoint_interval: int = 10) -> str:
    """Render the table's snapshot log as a Delta ``_delta_log``.
    Incremental and idempotent: versions already written are immutable
    and kept; missing ones are appended, with a parquet checkpoint every
    `checkpoint_interval` versions. Returns the log directory.

    Interplay with ``expire_snapshots``: warehouse expiry deletes old
    data files but this mirror keeps the already-written commit JSONs —
    exactly Delta VACUUM semantics (the full log replays to the correct
    head state; time travel to vacuumed versions fails at scan time
    with missing files). The Iceberg mirror instead REBUILDS its
    metadata on expiry, matching Iceberg's expireSnapshots."""
    snaps = warehouse.snapshots(table)
    if not snaps:
        raise ValueError(f"{table} has no snapshot log to mirror")
    root = warehouse.path(table)
    log_dir = os.path.join(root, LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    ds_col = warehouse.spec.column
    now_ms = int(time.time() * 1000)

    sample = None
    for s in snaps:
        if s["added_files"]:
            sample = os.path.join(root, s["added_files"][0])
            break
    if sample is None:
        raise ValueError(f"{table} has no data files")
    schema_string = _spark_schema_string(spark, sample, ds_col)

    def meta_for(schema_str: str) -> dict:
        return {"metaData": {
            "id": str(uuid_mod.uuid5(uuid_mod.NAMESPACE_URL, f"delta/{table}")),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_str,
            "partitionColumns": [ds_col],
            "configuration": {},
            "createdTime": now_ms,
        }}

    meta_action = meta_for(schema_string)
    protocol_action = {"protocol": {"minReaderVersion": 1,
                                    "minWriterVersion": 2}}

    state: dict[str, dict] = {}  # path -> add action (live set replay)
    known_cols = {f["name"] for f in
                  json.loads(schema_string)["fields"]}
    # protocol/metaData belong to the EARLIEST version actually written:
    # a first mirror after expire_snapshots starts at the rebased
    # baseline (version > 0), and a log with no metaData anywhere is
    # unreadable. Already-bootstrapped logs keep their original boot.
    written = {int(f[:20]) for f in os.listdir(log_dir)
               if f.endswith(".json") and f[:20].isdigit()}
    boot_version = (snaps[0]["snapshot_id"] - 1) if not written else None

    def replay_vfile(vfile: str):
        """adds/removes of an immutable already-written commit, plus any
        schema evolution it recorded — replayed instead of re-computing
        per-file size/mtime/footer stats (O(total files ever added) I/O
        per incremental mirror otherwise)."""
        nonlocal meta_action, schema_string, known_cols
        adds, removes = [], []
        with open(vfile) as fh:
            for line in fh:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "add" in a:
                    adds.append({"add": a["add"]})
                elif "remove" in a:
                    removes.append({"remove": a["remove"]})
                elif "metaData" in a:
                    meta_action = {"metaData": a["metaData"]}
                    schema_string = a["metaData"]["schemaString"]
                    known_cols = {f["name"] for f in
                                  json.loads(schema_string)["fields"]}
        return adds, removes

    # snapshot expiry REBASES the warehouse log (snaps[0] becomes a
    # baseline carrying the full live set under its original id) but this
    # mirror keeps pre-baseline commit JSONs (VACUUM semantics) — so the
    # checkpoint-state replay must start from those kept versions, not
    # from the rebased window alone: the baseline's already-written vfile
    # holds its ORIGINAL partial delta, and a checkpoint built without
    # the pre-baseline adds would silently drop still-live rows.
    first_version = snaps[0]["snapshot_id"] - 1
    for v in sorted(written):
        if v >= first_version:
            break
        adds, removes = replay_vfile(
            os.path.join(log_dir, f"{v:020d}.json"))
        for r in removes:
            state.pop(r["remove"]["path"], None)
        for a in adds:
            state[a["add"]["path"]] = a["add"]
    for s in snaps:
        version = s["snapshot_id"] - 1  # Delta versions are 0-based
        vfile = os.path.join(log_dir, f"{version:020d}.json")
        if os.path.exists(vfile):
            adds, removes = replay_vfile(vfile)
        else:
            # additive schema evolution: a commit whose newest file widens
            # the schema re-emits metaData in that version (Delta's own
            # mechanism for schema changes)
            schema_change = None
            if s["added_files"]:
                newest = os.path.join(root, sorted(s["added_files"])[-1])
                import pyarrow.parquet as _pq
                new_cols = {f.name for f in _pq.read_schema(newest)}
                if not new_cols <= known_cols:
                    # merge: existing fields keep place, new ones append
                    old_fields = json.loads(schema_string)["fields"]
                    file_fields = json.loads(
                        _spark_schema_string(spark, newest, ds_col))["fields"]
                    merged = old_fields + [f for f in file_fields
                                           if f["name"] not in known_cols]
                    schema_string = json.dumps(
                        {"type": "struct", "fields": merged})
                    known_cols |= {f["name"] for f in merged}
                    meta_action = meta_for(schema_string)
                    schema_change = meta_action
            adds = []
            for f in sorted(s["added_files"]):
                full = os.path.join(root, f)
                adds.append({"add": {
                    "path": f,
                    "partitionValues": {ds_col: warehouse._partition_of(f)},
                    "size": os.path.getsize(full),
                    "modificationTime": int(os.path.getmtime(full) * 1000),
                    "dataChange": True,
                    "stats": json.dumps(
                        {"numRecords": pq.read_metadata(full).num_rows}),
                }})
            removes = [{"remove": {"path": f, "deletionTimestamp": now_ms,
                                   "dataChange": True}}
                       for f in sorted(s["removed_files"])]
            if version == first_version and state:
                # rebased baseline never mirrored pre-expiry: its rebase
                # dropped the original removes, but the kept pre-baseline
                # vfiles still replay their adds — reconcile by removing
                # every replayed path this (overwrite) baseline does not
                # re-add, or expired files stay live in the Delta state
                add_paths = {a["add"]["path"] for a in adds}
                gone = {r["remove"]["path"] for r in removes}
                removes += [
                    {"remove": {"path": p, "deletionTimestamp": now_ms,
                                "dataChange": True}}
                    for p in sorted(state)
                    if p not in add_paths and p not in gone]
            actions = [{"commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE" if not s["removed_files"] else "OVERWRITE",
                "operationParameters": {"chronon-operation": s["operation"]},
            }}]
            if version in (0, boot_version):
                actions += [protocol_action, meta_action]
            elif schema_change is not None:
                actions += [schema_change]
            actions += removes + adds
            tmp = vfile + f".tmp.{os.getpid()}"
            with open(tmp, "w") as fh:
                fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
            os.replace(tmp, vfile)
        for r in removes:
            state.pop(r["remove"]["path"], None)
        for a in adds:
            state[a["add"]["path"]] = a["add"]
        if (version + 1) % checkpoint_interval == 0:
            _write_checkpoint(log_dir, version, state,
                              meta_action["metaData"],
                              protocol_action["protocol"])
    return log_dir


def _write_checkpoint(log_dir: str, version: int, state: dict,
                      metadata: dict, protocol: dict) -> None:
    cp = os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
    if os.path.exists(cp):
        return
    rows = ([{"add": a, "remove": None, "metaData": None, "protocol": None}
             for a in state.values()] +
            [{"add": None, "remove": None, "metaData": metadata,
              "protocol": None},
             {"add": None, "remove": None, "metaData": None,
              "protocol": protocol}])
    add_t = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()), ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()), ("stats", pa.string())])
    remove_t = pa.struct([("path", pa.string()),
                          ("deletionTimestamp", pa.int64()),
                          ("dataChange", pa.bool_())])
    meta_t = pa.struct([
        ("id", pa.string()),
        ("format", pa.struct([("provider", pa.string()),
                              ("options", pa.map_(pa.string(), pa.string()))])),
        ("schemaString", pa.string()),
        ("partitionColumns", pa.list_(pa.string())),
        ("configuration", pa.map_(pa.string(), pa.string())),
        ("createdTime", pa.int64())])
    proto_t = pa.struct([("minReaderVersion", pa.int32()),
                         ("minWriterVersion", pa.int32())])

    def mapify(d):
        return None if d is None else {
            **d, "partitionValues": list(d["partitionValues"].items())}

    tbl = pa.table({
        "add": pa.array([mapify(r["add"]) for r in rows], type=add_t),
        "remove": pa.array([r["remove"] for r in rows], type=remove_t),
        "metaData": pa.array(
            [None if r["metaData"] is None else
             {**r["metaData"],
              "format": {**r["metaData"]["format"],
                         "options": list(r["metaData"]["format"]["options"].items())},
              "configuration": list(r["metaData"]["configuration"].items())}
             for r in rows], type=meta_t),
        "protocol": pa.array([r["protocol"] for r in rows], type=proto_t),
    })
    tmp = cp + f".tmp.{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, cp)
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        json.dump({"version": version, "size": len(rows)}, fh)


# ------------------------------------------------------------ reader

class DeltaTable:
    """Reader over a Delta transaction log: state reconstruction from
    the newest checkpoint at-or-before the requested version plus the
    JSON commits after it — the protocol's prescribed read path."""

    def __init__(self, location: str):
        self.location = location
        self.log_dir = os.path.join(location, LOG_DIR)
        if not os.path.isdir(self.log_dir):
            raise FileNotFoundError(f"no _delta_log under {location}")

    def versions(self) -> list[int]:
        return sorted(int(f[:20]) for f in os.listdir(self.log_dir)
                      if f.endswith(".json") and f[:20].isdigit())

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise ValueError("empty delta log")
        return vs[-1]

    def _version_at(self, ts_ms: int) -> int:
        """TIMESTAMP AS OF: newest version whose commitInfo timestamp
        (or file mtime when absent) is <= ts_ms."""
        best = None
        for v in self.versions():
            t = self._commit_ts(v)
            if t <= ts_ms:
                best = v
        if best is None:
            raise ValueError(f"no version at or before {ts_ms}")
        return best

    def _commit_ts(self, version: int) -> int:
        path = os.path.join(self.log_dir, f"{version:020d}.json")
        with open(path) as fh:
            for line in fh:
                a = json.loads(line)
                if "commitInfo" in a and "timestamp" in a["commitInfo"]:
                    return a["commitInfo"]["timestamp"]
        return int(os.path.getmtime(path) * 1000)

    def _checkpoint_at_or_before(self, version: int) -> Optional[int]:
        names = os.listdir(self.log_dir)
        # multipart ('...checkpoint.0000000001.0000000002.parquet') and
        # V2/UUID checkpoints are real Delta layouts this reader does not
        # parse; silently ignoring one would replay from version 0 past
        # log-retention gaps into incomplete state — fail loudly instead
        exotic = [f for f in names
                  if ".checkpoint." in f and f.endswith(".parquet")
                  and not f.endswith(".checkpoint.parquet")]
        if exotic:
            raise ValueError(
                f"unsupported checkpoint format: {exotic[0]} (only "
                "single-part classic checkpoints are readable)")
        cps = sorted(int(f[:20]) for f in names
                     if f.endswith(".checkpoint.parquet"))
        cps = [c for c in cps if c <= version]
        return cps[-1] if cps else None

    def state(self, version: Optional[int] = None,
              as_of_ms: Optional[int] = None) -> dict:
        """{'adds': {path: add}, 'metaData': ..., 'protocol': ...} at a
        version (latest by default)."""
        if version is None and as_of_ms is not None:
            version = self._version_at(as_of_ms)
        if version is None:
            version = self.latest_version()
        if version not in self.versions():
            raise ValueError(f"unknown delta version {version}")
        adds: dict[str, dict] = {}
        meta = proto = None
        start = 0
        cp = self._checkpoint_at_or_before(version)
        if cp is not None:
            tbl = pq.read_table(
                os.path.join(self.log_dir, f"{cp:020d}.checkpoint.parquet"))
            for row in tbl.to_pylist():
                if row["add"]:
                    a = dict(row["add"])
                    a["partitionValues"] = dict(a.get("partitionValues") or {})
                    adds[a["path"]] = a
                if row["metaData"]:
                    meta = row["metaData"]
                if row["protocol"]:
                    proto = row["protocol"]
            start = cp + 1
        # versions below the first present JSON are legitimate only as a
        # rebased/vacuumed head (the first present commit then carries
        # protocol+metaData); a gap BETWEEN present commits means replay
        # would silently skip state transitions — fail loudly.
        present = [v for v in self.versions() if start <= v <= version]
        if cp is None and present:
            start = present[0]
        gaps = sorted(set(range(start, version + 1)) - set(present))
        if gaps:
            raise ValueError(
                f"delta log gap: missing commit version {gaps[0]} in "
                f"replay range [{start}, {version}]")
        for v in range(start, version + 1):
            path = os.path.join(self.log_dir, f"{v:020d}.json")
            with open(path) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    if "remove" in a:
                        adds.pop(a["remove"]["path"], None)
                    if "add" in a:
                        act = a["add"]
                        act.setdefault("partitionValues", {})
                        adds[act["path"]] = act
                    if "metaData" in a:
                        meta = a["metaData"]
                    if "protocol" in a:
                        proto = a["protocol"]
        if proto and proto.get("minReaderVersion", 1) > 2:
            raise ValueError(
                f"table requires reader version {proto['minReaderVersion']}")
        if meta is None:
            raise ValueError(
                "incomplete delta state: no metaData action in the replay "
                "range (vacuumed log head without a readable checkpoint?)")
        # column mapping stores PHYSICAL names (col-<uuid>) in the parquet
        # files; reading them under the logical schemaString would return
        # all nulls — silent wrong data, so reject loudly
        cm = (meta.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none")
        if cm not in ("", "none"):
            raise ValueError(
                f"delta.columnMapping.mode={cm} is unsupported (parquet "
                "columns are physically renamed)")
        return {"adds": adds, "metaData": meta, "protocol": proto}

    def files(self, version: Optional[int] = None,
              as_of_ms: Optional[int] = None) -> list[dict]:
        return sorted(self.state(version, as_of_ms)["adds"].values(),
                      key=lambda a: a["path"])

    def partitions(self, column: Optional[str] = None) -> list[str]:
        st = self.state()
        col = column or st["metaData"]["partitionColumns"][0]
        return sorted({a["partitionValues"].get(col)
                       for a in st["adds"].values()} - {None})

    def incremental_files(self, from_version: int,
                          to_version: int) -> list[dict]:
        """add actions with dataChange=true in (from, to] — the CDF-style
        appends-between primitive."""
        out = []
        for v in self.versions():
            if not (from_version < v <= to_version):
                continue
            with open(os.path.join(self.log_dir, f"{v:020d}.json")) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    if "add" in a and a["add"].get("dataChange", True):
                        a["add"].setdefault("partitionValues", {})
                        out.append(a["add"])
        return out

    # -- spark scans

    def _scan(self, spark: SparkSession, st: dict,
              files: list[dict]) -> DataFrame:
        part_cols = (st["metaData"] or {}).get("partitionColumns", [])
        if not files:
            full = self.files()
            if not full:
                raise ValueError("empty table: no live files")
            return self._scan(spark, st, full).limit(0)
        paths = [os.path.join(self.location, a["path"]) for a in files]
        reader = spark.read
        if st["metaData"]:
            # read with the LOG's schema (files written under an older
            # metaData return null for later columns; no footer-based
            # inference at any file count)
            from pyspark.sql.types import StructType
            full = StructType.fromJson(json.loads(st["metaData"]["schemaString"]))
            reader = reader.schema(StructType(
                [f for f in full.fields if f.name not in part_cols]))
        df = reader.parquet(*paths)
        from chronon_spark.sources.catalog import recover_partition_column
        for col in part_cols:
            if col in df.columns:
                continue
            df = recover_partition_column(
                df, {os.path.join(self.location, a["path"]):
                     a["partitionValues"].get(col) for a in files}, col)
        return df

    def read(self, spark: SparkSession, version: Optional[int] = None,
             as_of_ms: Optional[int] = None,
             partition_range: Optional[tuple] = None) -> DataFrame:
        """`partition_range` = (start, end) inclusive bounds on the first
        partition column: files outside are dropped from the plan using
        the log's partitionValues alone (metadata partition pruning)."""
        st = self.state(version, as_of_ms)
        files = sorted(st["adds"].values(), key=lambda a: a["path"])
        if partition_range is not None and st["metaData"]:
            pcols = st["metaData"].get("partitionColumns") or []
            if pcols:
                lo, hi = partition_range
                col = pcols[0]

                def keep(a):
                    v = a["partitionValues"].get(col)
                    return (v is not None and (lo is None or v >= lo)
                            and (hi is None or v <= hi))

                files = [a for a in files if keep(a)]
        return self._scan(spark, st, files)

    def read_incremental(self, spark: SparkSession, from_version: int,
                         to_version: int) -> DataFrame:
        return self._scan(spark, self.state(to_version),
                          self.incremental_files(from_version, to_version))
