"""Orchestration support: scoped config, Closer, FileSystem facade.

These are the reference's job-plumbing pieces that are not Spark operators
but that a user of the reference relies on to assemble jobs:

* scoped config — the reference distributes one nested config tree to each
  component by "peeling off" its scope prefix
  (``databuilder/__init__.py:63-75`` ``Scoped.get_scoped_conf``; scope
  strings like ``extractor.mysql.url``).  Here the tree is a plain dict
  (JSON-friendly — no pyhocon dependency); both nested dicts and flat
  dotted keys are accepted, mirroring HOCON's equivalence of the two.
* ``Closer`` — LIFO close-callback stack where every callback is guaranteed
  to run and only the *last* failure propagates
  (``databuilder/utils/closer.py:8-51``).
* ``FileSystem`` — a thin facade over an injected fs client (the reference
  wraps a Dask filesystem: ``databuilder/filesystem/filesystem.py:35-113``)
  with bounded retry on transient errors, no retry on client-side errors,
  and a metadata key-mapping so differently-shaped ``info()`` dicts land in
  one ``FileMetadata`` contract (``databuilder/filesystem/metadata.py:7``).

The Spark-side consumers (``sources/fs_probe.py``, ``job.py --conf``) take
these as plain values/callables — nothing here touches the JVM, so the
module stays importable on executors without a session.
"""

from __future__ import annotations

import time
from typing import Any, Callable, List, NamedTuple

_MISSING = object()


def scoped_conf(conf: dict | None, scope: str) -> dict:
    """Peel ``scope`` (dotted) off a nested config dict.

    Mirrors ``Scoped.get_scoped_conf`` (reference ``databuilder/__init__.py:
    63-75``): an empty scope or a missing path yields an empty dict, so
    components can always ``.get`` with defaults.  Flat dotted keys at any
    level are folded in (HOCON treats ``a.b.c: x`` and nested ``a {b {c:
    x}}`` identically), with nested entries winning on conflict.
    """
    if not conf or not scope:
        return {}
    node: Any = conf
    for part in scope.split("."):
        if not isinstance(node, dict):
            return {}
        nxt = node.get(part, _MISSING)
        # fold flat dotted keys ("mysql.url") into the walk
        flat = {
            k[len(part) + 1:]: v
            for k, v in node.items()
            if isinstance(k, str) and k.startswith(part + ".")
        }
        if nxt is _MISSING and not flat:
            return {}
        if flat:
            exploded = _explode_dotted(flat)
            if isinstance(nxt, dict):
                # deep-merge so {"a.b.x":1} and a{b{y:2}} both survive;
                # nested entries win on leaf conflicts (HOCON order)
                nxt = with_fallback(nxt, exploded)
            elif nxt is _MISSING:
                nxt = exploded
        node = nxt
    return node if isinstance(node, dict) else {}


def _explode_dotted(flat: dict) -> dict:
    out: dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def conf_get(conf: dict | None, dotted: str, default: Any = None) -> Any:
    """``conf.get('extractor.mysql.url', default)`` over a nested dict."""
    if not conf:
        return default
    head, _, rest = dotted.partition(".")
    if not rest:
        return conf.get(head, default) if isinstance(conf, dict) else default
    sub = scoped_conf(conf, head)
    return conf_get(sub, rest, default) if sub else default


def with_fallback(conf: dict | None, defaults: dict | None) -> dict:
    """Deep-merge ``conf`` over ``defaults`` (reference ``conf.with_fallback
    (DEFAULT_CONFIG)`` idiom, e.g. ``filesystem.py:77``)."""
    if not defaults:
        return dict(conf or {})
    out = dict(defaults)
    for k, v in (conf or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = with_fallback(v, out[k])
        else:
            out[k] = v
    return out


class Closer:
    """LIFO close-callback stack (reference ``utils/closer.py:8-51``).

    Every registered callable runs on :meth:`close`; if several raise, only
    the last failure propagates.  LIFO order lets dependents close before
    their dependencies (e.g. a streaming query before its session).
    """

    def __init__(self) -> None:
        self._stack: List[Callable[[], Any]] = []

    def register(self, close_callable: Callable[[], Any]) -> None:
        if not callable(close_callable):
            raise RuntimeError(
                f"Only callable can be registered: {close_callable!r}")
        self._stack.append(close_callable)

    def close(self) -> None:
        last_exception: BaseException | None = None
        while self._stack:
            try:
                self._stack.pop()()
            except Exception as e:  # noqa: BLE001 — guarantee all run
                last_exception = e
        if last_exception is not None:
            raise last_exception

    # context-manager form — the Spark-idiomatic way to scope a job
    def __enter__(self) -> "Closer":
        return self

    def __exit__(self, *exc: object) -> None:
        self.close()


class FileMetadata(NamedTuple):
    """One file's metadata contract (reference ``filesystem/metadata.py:7``)."""

    path: str
    last_updated: Any
    size: int


#: error types the reference never retries (``filesystem.py:14,17-23``)
CLIENT_ERRORS = {"ClientError", "FileNotFoundError", "ParamValidationError"}


def is_client_side_error(e: Exception) -> bool:
    return type(e).__name__ in CLIENT_ERRORS


class FileSystem:
    """Retrying facade over an injected fs client.

    The client needs ``ls(path) -> list[str]`` and ``info(path) -> dict``
    (the Dask filesystem surface the reference wraps, ``filesystem.py:
    60-75``).  ``metadata_mapping`` renames the client's info keys into the
    :class:`FileMetadata` contract — default matches the reference's S3
    mapping ``{'last_updated': 'LastModified', 'size': 'Size'}``
    (``filesystem.py:54-55``).  Transient errors retry up to ``attempts``
    with exponential backoff; client-side errors raise immediately
    (``filesystem.py:78-79`` retry predicate).
    """

    DEFAULT_METADATA_MAPPING = {"last_updated": "LastModified", "size": "Size"}

    def __init__(self, client: Any,
                 metadata_mapping: dict | None = None,
                 attempts: int = 3,
                 backoff_base_sec: float = 1.0,
                 backoff_max_sec: float = 5.0,
                 _sleep: Callable[[float], None] = time.sleep) -> None:
        self._client = client
        self._mapping = with_fallback(
            metadata_mapping, self.DEFAULT_METADATA_MAPPING)
        self._attempts = max(1, attempts)
        self._base = backoff_base_sec
        self._max = backoff_max_sec
        self._sleep = _sleep

    def _retry(self, fn: Callable[[], Any]) -> Any:
        for attempt in range(self._attempts):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — classified below
                if is_client_side_error(e) or attempt == self._attempts - 1:
                    raise
                self._sleep(min(self._max, self._base * (2 ** attempt)))

    def ls(self, path: str) -> List[str]:
        return self._retry(lambda: list(self._client.ls(path)))

    def is_file(self, path: str) -> bool:
        # the reference's definition: ls() of a file returns exactly itself
        # (``filesystem.py:93-95``)
        contents = self._retry(lambda: list(self._client.ls(path)))
        return len(contents) == 1 and contents[0] == path

    def info(self, path: str) -> FileMetadata:
        d = self._retry(lambda: self._client.info(path))
        return FileMetadata(
            path=path,
            last_updated=d[self._mapping["last_updated"]],
            size=d[self._mapping["size"]],
        )
