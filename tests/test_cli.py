"""CLI option surface (A13): the reference-mirroring flags plus the
round-12 multi-receiver / engine selectors parse and default sanely."""

from __future__ import annotations

from dump1090_stream_parser_spark.cli import build_parser


def test_defaults_mirror_reference():
    a = build_parser().parse_args([])
    assert (a.location, a.port) == ("localhost", 30003)
    assert a.buffer_size == 65536
    assert a.connect_attempt_limit == 10
    assert a.connect_attempt_delay == 5.0
    assert a.engine == "python" and a.hosts is None


def test_multi_receiver_and_engine_flags():
    a = build_parser().parse_args(
        ["--hosts", "r1:31003,r2", "--engine", "jvm", "-d", "/tmp/out"]
    )
    assert a.hosts == "r1:31003,r2"
    assert a.engine == "jvm"
    assert a.database == "/tmp/out"


def test_engine_rejects_unknown():
    import pytest

    with pytest.raises(SystemExit):
        build_parser().parse_args(["--engine", "scala"])
