"""Scoped config, Closer, FileSystem facade (reference job plumbing).

Reference semantics: ``databuilder/__init__.py:63-75`` (scoped conf),
``databuilder/utils/closer.py:8-51`` (LIFO + last-failure propagation),
``databuilder/filesystem/filesystem.py:54-113`` (metadata mapping, retry
classes, ``is_file`` definition).
"""

import json

import pytest

from amundsendatabuilder_spark.orchestration import (
    Closer,
    FileMetadata,
    FileSystem,
    conf_get,
    is_client_side_error,
    scoped_conf,
    with_fallback,
)


# ---------------------------------------------------------------- scoped conf
def test_scoped_conf_nested_and_missing():
    conf = {"extractor": {"mysql": {"url": "jdbc:x", "port": 3306}}}
    assert scoped_conf(conf, "extractor.mysql") == {"url": "jdbc:x", "port": 3306}
    # missing scope and empty scope both yield an empty config, never KeyError
    assert scoped_conf(conf, "extractor.pg") == {}
    assert scoped_conf(conf, "") == {}
    assert scoped_conf(None, "extractor") == {}


def test_scoped_conf_flat_dotted_keys_fold_in():
    # HOCON equivalence: "a.b.c: x" == a { b { c: x } }; nested wins on clash
    conf = {
        "extractor.mysql.url": "flat",
        "extractor": {"mysql": {"port": 3306}, "pg.url": "pgflat"},
    }
    assert scoped_conf(conf, "extractor.mysql") == {"url": "flat", "port": 3306}
    assert scoped_conf(conf, "extractor.pg") == {"url": "pgflat"}
    nested_wins = {"a.b": {"k": "flat"}, "a": {"b": {"k": "nested"}}}
    assert scoped_conf(nested_wins, "a.b") == {"k": "nested"}


def test_conf_get_and_fallback():
    conf = {"loader": {"fs": {"path": "/tmp/x"}}}
    assert conf_get(conf, "loader.fs.path") == "/tmp/x"
    assert conf_get(conf, "loader.fs.missing", 7) == 7
    assert conf_get(conf, "nope.deep.key", "d") == "d"
    merged = with_fallback({"a": {"b": 1}}, {"a": {"b": 0, "c": 2}, "d": 3})
    assert merged == {"a": {"b": 1, "c": 2}, "d": 3}


def test_job_cli_scoped_conf_wiring(tmp_path):
    # pipeline.* scope feeds the CLI defaults; a conf WITHOUT warehouse in
    # scope still errors out (before any Spark work), proving the scope walk
    # ran and did not leak top-level keys into the pipeline scope
    from amundsendatabuilder_spark.job import main

    conf = {"warehouse": "/should/not/leak", "pipeline": {"buckets": 64}}
    f = tmp_path / "conf.json"
    f.write_text(json.dumps(conf))
    with pytest.raises(SystemExit):
        main(["--conf", str(f)])


# -------------------------------------------------------------------- Closer
def test_closer_lifo_and_last_failure_propagates():
    order = []

    def ok(tag):
        return lambda: order.append(tag)

    def boom(tag, msg):
        def _c():
            order.append(tag)
            raise ValueError(msg)
        return _c

    c = Closer()
    c.register(ok("first-registered"))
    c.register(boom("mid", "earlier"))
    c.register(boom("late", "later"))
    c.register(ok("last-registered"))
    with pytest.raises(ValueError) as ei:
        c.close()
    # LIFO: last registered runs first; ALL ran despite two failures;
    # only the LAST failure (the earlier-registered boom) propagates
    assert order == ["last-registered", "late", "mid", "first-registered"]
    assert str(ei.value) == "earlier"
    c.close()  # drained — idempotent


def test_closer_rejects_non_callable_and_context_manager():
    c = Closer()
    with pytest.raises(RuntimeError):
        c.register("not-callable")
    hits = []
    with Closer() as cm:
        cm.register(lambda: hits.append(1))
    assert hits == [1]


# ---------------------------------------------------------------- FileSystem
class _FlakyClient:
    """ls/info fail transiently N times, then succeed."""

    def __init__(self, fail_times=0, error=RuntimeError("transient")):
        self.fail_times = fail_times
        self.error = error
        self.calls = 0
        self.files = {"/data/t1/part-0": {"LastModified": 1111, "Size": 42}}

    def _maybe_fail(self):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise self.error

    def ls(self, path):
        self._maybe_fail()
        if path in self.files:
            return [path]
        return [p for p in self.files if p.startswith(path.rstrip("/") + "/")]

    def info(self, path):
        self._maybe_fail()
        return self.files[path]


def test_filesystem_retries_transient_then_succeeds():
    sleeps = []
    cl = _FlakyClient(fail_times=2)
    fs = FileSystem(cl, _sleep=sleeps.append)
    assert fs.ls("/data/t1") == ["/data/t1/part-0"]
    assert cl.calls == 3
    assert sleeps == [1.0, 2.0]  # exponential, capped at 5s


def test_filesystem_client_error_not_retried():
    cl = _FlakyClient(fail_times=5, error=FileNotFoundError("/gone"))
    fs = FileSystem(cl, _sleep=lambda s: None)
    with pytest.raises(FileNotFoundError):
        fs.ls("/gone")
    assert cl.calls == 1  # no retry on client-side errors
    assert is_client_side_error(FileNotFoundError())
    assert not is_client_side_error(RuntimeError())


def test_filesystem_is_file_and_info_mapping():
    fs = FileSystem(_FlakyClient(), _sleep=lambda s: None)
    assert fs.is_file("/data/t1/part-0")
    assert not fs.is_file("/data/t1")
    got = fs.info("/data/t1/part-0")
    assert got == FileMetadata(path="/data/t1/part-0", last_updated=1111, size=42)
    # custom mapping for a client whose info() uses different keys
    class _C(_FlakyClient):
        def info(self, path):
            return {"mtime": 9, "length": 5}
    fs2 = FileSystem(_C(), metadata_mapping={"last_updated": "mtime",
                                             "size": "length"})
    assert fs2.info("/data/t1/part-0") == FileMetadata("/data/t1/part-0", 9, 5)
