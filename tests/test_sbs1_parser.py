"""Golden-line + property tests for the SBS-1 Bronze->Silver parser
(SURVEY.md §5.2 items 2-3; fixtures from FIXTURES.md §1)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dump1090_stream_parser_spark.sources.sbs1 import (
    POPULATION_MATRIX,
    SBS1_FIELDS,
    dead_letter,
    parse_lines,
    silver,
)

GOLDEN = [
    "MSG,1,1,1,4CA2D6,1,2026/08/13,10:00:01.000,2026/08/13,10:00:01.050,BAW256,,,,,,,,,,,",
    "MSG,2,1,1,A1B2C3,1,2026/08/13,10:00:03.000,2026/08/13,10:00:03.020,,0,12.5,245.0,51.47001,-0.45430,,,,,,-1",
    "MSG,3,1,1,4CA2D6,1,2026/08/13,10:00:02.000,2026/08/13,10:00:02.040,,37000,,,51.46720,-0.18195,,,0,0,0,0",
    "MSG,4,1,1,4CA2D6,1,2026/08/13,10:00:04.000,2026/08/13,10:00:04.030,,,420.0,263.5,,,64,,,,,",
    "MSG,5,1,1,7C6B2E,1,2026/08/13,10:00:05.000,2026/08/13,10:00:05.015,,11900,,,,,,,0,,0,0",
    "MSG,6,1,1,7C6B2E,1,2026/08/13,10:00:06.000,2026/08/13,10:00:06.025,,11900,,,,,,7000,0,0,0,0",
    "MSG,7,1,1,4CA2D6,1,2026/08/13,10:00:07.000,2026/08/13,10:00:07.010,,36975,,,,,,,,,,0",
    "MSG,8,1,1,4CA2D6,1,2026/08/13,10:00:08.000,2026/08/13,10:00:08.005,,,,,,,,,,,,0",
]

INVALID = [
    "AIR,,1,1,4CA2D6,1,2026/08/13,10:00:09.000,2026/08/13,10:00:09.010",
    "STA,,1,1,4CA2D6,1,2026/08/13,10:00:10.000,2026/08/13,10:00:10.010,RM",
    "MSG,3,1,1,4CA2D6,1,2026/08/13,10:00",
    "MSG,3,1,1,4CA2D6,1,2026/08/13,10:00:11.000,2026/08/13,10:00:11.040,,37000,,,51.4,-0.1,,,0,0,0,0,EXTRA",
]

#: Fields that are always populated on a valid MSG line.
ALWAYS = {
    "message_type",
    "transmission_type",
    "session_id",
    "aircraft_id",
    "hex_ident",
    "flight_id",
    "generated_date",
    "generated_time",
    "logged_date",
    "logged_time",
}


def _parse(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    return parse_lines(df, parsed_time=F.lit("2026-08-13 12:00:00").cast("timestamp"))


def test_golden_lines_match_population_matrix(spark):
    rows = {
        r["transmission_type"]: r
        for r in silver(_parse(spark, GOLDEN)).collect()
    }
    assert set(rows) == set(range(1, 9))
    nullable = {name for name, _ in SBS1_FIELDS} - ALWAYS
    for ttype, row in rows.items():
        expected = POPULATION_MATRIX[ttype]
        populated = {f for f in nullable if row[f] is not None}
        assert populated == expected, f"type {ttype}: {populated} != {expected}"


def test_golden_values_typed(spark):
    rows = {r["transmission_type"]: r for r in silver(_parse(spark, GOLDEN)).collect()}
    assert rows[1]["callsign"] == "BAW256"
    assert rows[2]["ground_speed"] == pytest.approx(12.5)  # DOUBLE, not INT
    assert rows[2]["lat"] == pytest.approx(51.47001)
    assert rows[2]["is_on_ground"] == -1
    assert rows[3]["altitude"] == 37000
    assert rows[4]["vertical_rate"] == pytest.approx(64.0)
    assert rows[6]["squawk"] == "7000"  # STRING: leading zeros preserved
    assert rows[3]["generated_ts"] == datetime.datetime(2026, 8, 13, 10, 0, 2)
    assert rows[3]["parsed_time"] is not None


def test_invalid_lines_dead_lettered(spark):
    parsed = _parse(spark, GOLDEN + INVALID)
    assert silver(parsed).count() == len(GOLDEN)
    dl = dead_letter(parsed).collect()
    assert sorted(r["raw_line"] for r in dl) == sorted(INVALID)
    assert all(r["reason"] == "arity != 22" for r in dl)


def test_crlf_tolerated(spark):
    rows = silver(_parse(spark, [GOLDEN[2] + "\r"])).collect()
    assert len(rows) == 1
    assert rows[0]["is_on_ground"] == 0  # trailing \r stripped before cast


def test_empty_string_becomes_null_not_zero(spark):
    # SQLite affinity would store ''; we normalize to NULL (SURVEY.md §7.4.1).
    row = silver(_parse(spark, [GOLDEN[0]])).collect()[0]
    assert row["altitude"] is None
    assert row["callsign"] == "BAW256"


def test_property_arbitrary_arity_never_throws(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # SBS-1 has no quoting; any comma count != 21 must dead-letter.
    # Exclude surrogates (category Cs): they cannot round-trip through
    # UTF-8, so Spark would store U+FFFD -- a codec fact, not a parser bug.
    field = st.text(
        alphabet=st.characters(
            blacklist_characters=",\n\r", blacklist_categories=("Cs",)
        ),
        max_size=8,
    )

    @settings(max_examples=20, deadline=None)
    @given(st.lists(field, min_size=1, max_size=40))
    def check(fields):
        line = ",".join(fields)
        parsed = _parse(spark, [line]).collect()
        assert len(parsed) == 1
        if len(fields) == 22:
            assert parsed[0]["_corrupt_record"] is None
        else:
            assert parsed[0]["_corrupt_record"] == line

    check()


def test_non_msg_lines_dead_letter(spark):
    """SBS-1 SEL/ID/AIR/STA/CLK records carry fewer than 22 fields; the
    reference's len==22 gate rebuffers (drops) them and so must we --
    into the dead letter, raw line preserved."""
    non_msg = [
        # SEL: 11 fields
        "SEL,,496,2286,4CA4E5,27215,2010/02/19,18:06:07.710,2010/02/19,18:06:07.710,RYR1427",
        # ID: 11 fields
        "ID,,496,7162,405637,27928,2010/02/19,18:06:07.115,2010/02/19,18:06:07.115,EZY691A",
        # AIR: 10 fields
        "AIR,,496,5906,400F01,27931,2010/02/19,18:06:07.128,2010/02/19,18:06:07.128",
        # CLK: 10 fields
        "CLK,,496,-1,,-1,2010/02/19,18:18:19.036,2010/02/19,18:18:19.036",
    ]
    parsed = _parse(spark, non_msg).collect()
    assert all(r["_corrupt_record"] is not None for r in parsed)
    assert [r["_corrupt_record"] for r in parsed] == non_msg


def test_gold_synthesis_excludes_null_mapped_rows(spark):
    """The gold query's line synthesis must EXCLUDE events rows with a
    NULL in any mapped column (ts/user_id/event_id): concat_ws SKIPS
    NULL fields rather than emitting an empty slot, so without the
    filter such a row would produce an arity!=22 line that parse_lines
    dead-letters while the DuckDB oracle (computing straight from
    events) would still count it -- a silent row-loss divergence. Pins
    the _MAPPED_NOT_NULL_SQL contract with data the testdata doesn't
    contain."""
    from dump1090_stream_parser_spark.operators.sbs1_gold import (
        sbs1_lines_from_events,
    )

    ts = datetime.datetime(2010, 2, 19, 18, 6, 7, 710000)
    rows = [
        (ts, 7, 1),  # clean
        (ts, 8, 2),  # clean
        (None, 9, 3),  # NULL ts
        (ts, None, 4),  # NULL user_id
        (ts, 10, None),  # NULL event_id
    ]
    events = spark.createDataFrame(
        rows, "ts timestamp, user_id bigint, event_id bigint"
    )
    lines = sbs1_lines_from_events(events)
    vals = [r["value"] for r in lines.collect()]
    assert len(vals) == 2  # only the clean rows synthesize lines
    assert all(v.count(",") == 21 for v in vals)  # 22 fields each
    parsed = parse_lines(lines).collect()
    assert len(parsed) == 2
    assert all(r["_corrupt_record"] is None for r in parsed)
    # the mechanism the filter guards against is real: concat_ws SKIPS
    # a NULL field entirely (no empty slot), shifting the arity
    short = spark.createDataFrame(
        [("a", None, "c")], "x string, y string, z string"
    ).select(F.concat_ws(",", "x", "y", "z").alias("v"))
    assert short.first()["v"] == "a,c"  # NULL field vanished


def test_gold_synthesis_excludes_negative_ids(spark):
    """Sign pinning (ADVICE r5): a negative user_id would format
    differently between Spark's format_string('%06X') (two's-complement
    64-bit hex) and DuckDB's printf, and a negative event_id would
    synthesize is_on_ground=-1 -- the shared predicate must exclude
    them in BOTH gold builders, with data the testdata doesn't
    contain."""
    import datetime

    from dump1090_stream_parser_spark.operators.sbs1_gold import (
        sbs1_lines_from_events,
        sbs1_lines_with_faults,
    )

    ts = datetime.datetime(2010, 2, 19, 18, 6, 7, 710000)
    rows = [
        (ts, 7, 1),  # clean
        (ts, -7, 2),  # negative user_id
        (ts, 8, -3),  # negative event_id
    ]
    events = spark.createDataFrame(
        rows, "ts timestamp, user_id bigint, event_id bigint"
    )
    for builder in (sbs1_lines_from_events, sbs1_lines_with_faults):
        vals = [r["value"] for r in builder(events).collect()]
        assert len(vals) == 1, builder.__name__
        assert vals[0].split(",")[4] == "000007"  # hex of the clean row


def test_property_typed_fields_parse_or_null(spark):
    """§7.4.1 NULL-on-garbage, property form: for a 22-field line with
    ARBITRARY altitude/lat content, the typed column either equals the
    correctly-parsed value or is NULL -- never a thrown ANSI cast
    error, never a zero standing in for garbage."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = GOLDEN[0].split(",")
    assert len(base) == 22

    content = st.one_of(
        st.just(""),
        st.integers(min_value=-(2**33), max_value=2**33).map(str),
        st.text(
            alphabet=st.characters(
                blacklist_characters=",\n\r",
                blacklist_categories=("Cs",),
            ),
            max_size=6,
        ),
    )

    import re

    int_re = re.compile(r"[+-]?[0-9]{1,10}")
    float_re = re.compile(
        r"[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?"
    )
    # characters try_cast DOUBLE may accept beyond the strict float
    # grammar (Java suffixes, exponent signs, whitespace trim) -- a
    # string containing anything OUTSIDE this set is certainly garbage
    numeric_ish = set("0123456789+-.eEdDfF \t")

    @settings(max_examples=15, deadline=None)
    @given(content, content)
    def check(alt_text, lat_text):
        fields = list(base)
        fields[11] = alt_text  # altitude (int)
        fields[14] = lat_text  # lat (double)
        line = ",".join(fields)
        row = _parse(spark, [line]).collect()[0]
        # the hard invariant: arity 22 always parses, never throws
        assert row["_corrupt_record"] is None
        # Value assertions only where Python-side expectation and Spark
        # try_cast semantics provably agree; outside these classes
        # (Unicode digits, '1_0' separators, exotic whitespace, Java
        # 'd'/'f' suffixes) the two parsers legitimately diverge and
        # the no-throw invariant above is the property under test.
        if alt_text == "":
            assert row["altitude"] is None
        elif int_re.fullmatch(alt_text):
            v = int(alt_text)
            expect = v if -(2**31) <= v < 2**31 else None
            assert row["altitude"] == expect, (alt_text, row["altitude"])
        elif any(c not in numeric_ish for c in alt_text):
            assert row["altitude"] is None, (alt_text, row["altitude"])
        if lat_text == "":
            assert row["lat"] is None
        elif float_re.fullmatch(lat_text):
            assert row["lat"] == float(lat_text), (lat_text, row["lat"])
        elif any(c not in numeric_ish for c in lat_text):
            assert row["lat"] is None, (lat_text, row["lat"])

    check()


def test_crlf_trim_matches_protocol_and_strip_semantics(spark):
    """Round-13 parse-path change (regexp '\\r$' -> rtrim '\\r'): the
    certified behavior on protocol-legal lines (at most one trailing
    CR from CRLF framing) is bit-identical; pathological multi-CR
    tails now trim fully, the reference strip() behavior."""
    from dump1090_stream_parser_spark.sources.sbs1 import parse_lines

    lines = spark.createDataFrame(
        [
            ("MSG,8,1,1,ABC123,1,,,,,,,,,,,,,,,,0\r",),
            ("MSG,8,1,1,ABC124,1,,,,,,,,,,,,,,,,0",),
            ("MSG,8,1,1,ABC125,1,,,,,,,,,,,,,,,,0\r\r",),
        ],
        "value string",
    )
    out = parse_lines(lines).collect()
    assert [r.hex_ident for r in out] == ["ABC123", "ABC124", "ABC125"]
    assert all(r._corrupt_record is None for r in out)
    assert all(r.is_on_ground == 0 for r in out)
