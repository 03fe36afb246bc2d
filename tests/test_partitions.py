"""Partition algebra unit tests (reference semantics: api/.../DataRange.scala,
TableUtils.unfilledRanges)."""

from chronon_spark.partitions import (
    DEFAULT_SPEC,
    PartitionRange,
    chunk,
    unfilled_ranges,
)


def test_shift_after_before():
    assert DEFAULT_SPEC.after("2024-01-31") == "2024-02-01"
    assert DEFAULT_SPEC.before("2024-03-01") == "2024-02-29"  # leap year
    assert DEFAULT_SPEC.shift("2024-01-01", 10) == "2024-01-11"


def test_epoch_roundtrip():
    ms = DEFAULT_SPEC.epoch_millis("2024-01-02")
    assert ms == 1704153600000
    assert DEFAULT_SPEC.of_epoch_millis(ms) == "2024-01-02"


def test_range_partitions_steps():
    r = PartitionRange("2024-01-01", "2024-01-07")
    assert len(r.partitions()) == 7
    steps = r.steps(3)
    assert [(s.start, s.end) for s in steps] == [
        ("2024-01-01", "2024-01-03"),
        ("2024-01-04", "2024-01-06"),
        ("2024-01-07", "2024-01-07"),
    ]


def test_range_intersect_contains():
    a = PartitionRange("2024-01-01", "2024-01-10")
    b = PartitionRange("2024-01-05", None)
    i = a.intersect(b)
    assert (i.start, i.end) == ("2024-01-05", "2024-01-10")
    assert "2024-01-05" in i and "2024-01-04" not in i


def test_where_clauses():
    r = PartitionRange("2024-01-01", "2024-01-03")
    assert r.where_clauses() == ["ds >= '2024-01-01'", "ds < '2024-01-04'"]


def test_chunk_holes():
    rs = chunk(["2024-01-01", "2024-01-02", "2024-01-05", "2024-01-06", "2024-01-09"])
    assert [(r.start, r.end) for r in rs] == [
        ("2024-01-01", "2024-01-02"),
        ("2024-01-05", "2024-01-06"),
        ("2024-01-09", "2024-01-09"),
    ]


def test_unfilled_ranges_skip_first_hole():
    wanted = PartitionRange("2024-01-01", "2024-01-10")
    existing = ["2024-01-03", "2024-01-04", "2024-01-07"]
    # leading hole (01-01, 01-02) skipped by default
    rs = unfilled_ranges(wanted, existing)
    assert [(r.start, r.end) for r in rs] == [
        ("2024-01-05", "2024-01-06"),
        ("2024-01-08", "2024-01-10"),
    ]
    rs_all = unfilled_ranges(wanted, existing, skip_first_hole=False)
    assert (rs_all[0].start, rs_all[0].end) == ("2024-01-01", "2024-01-02")


def test_unfilled_ranges_empty_output():
    wanted = PartitionRange("2024-01-01", "2024-01-03")
    rs = unfilled_ranges(wanted, [])
    assert [(r.start, r.end) for r in rs] == [("2024-01-01", "2024-01-03")]
