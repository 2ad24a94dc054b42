"""REST API correlated 1:1 / 1:N join — the decorator-pattern nested-loop
fetch powering the Mode/Redash/Tableau dashboard extractors.

Re-expresses ``databuilder/rest_api/rest_api_query.py:19`` (execute
:134-185, URL substitution :187-193, sub-record zip :208-249) Spark-first:
the driver-side generator chain becomes ``mapInPandas`` over the previous
query's DataFrame — each partition performs its own batched fetches (the
scale replacement for the reference's single-threaded ``requests.get`` loop;
the reference's 5-try exponential retry collapses into Spark task retries +
idempotent GETs), and the 1:N "sub-record" expansion is a per-row zip of the
JSON-path matches, yielded as extra output rows exactly like the reference.

The fetcher is injected (``fetch: url -> parsed JSON``): in production an
HTTP client; in this sandbox (no network) a deterministic local function —
the join/zip semantics are what this module owns and tests.

JSON-path support is the dotted/bracket subset the reference extractors use:
``a.b[*].c`` navigates dicts and fans out over lists; comma-separated paths
(``x,y`` — the reference's AND) select multiple fields per match, and
``json_path_contains_or`` flips to the OR layout (field-major) per
``rest_api_query.py:208-249``.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _find(obj: Any, path: list[str]) -> list[Any]:
    """Minimal JSONPath: dotted keys; '[*]' or bare list fan-out."""
    if not path:
        return [obj]
    head, rest = path[0], path[1:]
    out: list[Any] = []
    if head == "[*]":
        if isinstance(obj, list):
            for item in obj:
                out.extend(_find(item, rest))
        return out
    if isinstance(obj, list):
        for item in obj:
            out.extend(_find(item, path))
        return out
    if isinstance(obj, dict) and head in obj:
        out.extend(_find(obj[head], rest))
    return out


def _tokenize(p: str) -> list[str]:
    toks: list[str] = []
    for part in p.strip().split("."):
        if part.endswith("[*]"):
            if part[:-3]:
                toks.append(part[:-3])
            toks.append("[*]")
        elif part:
            toks.append(part)
    return toks


def _expand_paths(json_path: str) -> tuple[list[str], bool]:
    """The reference extractors' jsonpath-rw dialect → (flat path list,
    top-level separator was ``|``): ``(p)`` grouping parens strip; ``p | q``
    unions split; a trailing bracket field list ``prefix[*].[a,b,c]``
    (mode/redash/tableau queries, e.g. ``mode_dashboard_utils.py:42``)
    expands to ``prefix[*].a, prefix[*].b, prefix[*].c``. The separator
    determines the match layout jsonpath-rw would produce: comma field
    lists come back row-major per match (the AND interleave), while ``|``
    unions come back field-major (all of path 1, then all of path 2 —
    reference ``rest_api_query.py:216-231``)."""
    # split on , and | at bracket/paren depth 0 only — commas inside a field
    # list [a,b,c] belong to that segment
    pieces: list[str] = []
    buf: list[str] = []
    depth = 0
    is_or = False
    for ch in json_path:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch in ",|" and depth == 0:
            if ch == "|":
                is_or = True
            pieces.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    pieces.append("".join(buf))

    expanded: list[str] = []
    for p in pieces:
        p = p.strip()
        if p.startswith("(") and p.endswith(")"):
            p = p[1:-1].strip()
        if not p:
            continue
        if p.endswith("]") and not p.endswith("[*]"):
            prefix, _, fields = p.rpartition("[")
            prefix = prefix.rstrip(".")
            for f in fields.rstrip("]").split(","):
                expanded.append(f"{prefix}.{f.strip()}" if prefix else f.strip())
        else:
            expanded.append(p)
    return expanded, is_or


def _values_from_tokens(payload: Any, token_lists: list[list],
                        is_or: bool, json_path: str) -> list[Any]:
    """Core of ``json_path_values`` over pre-tokenized paths — the hot
    per-record path of ``rest_api_join`` (parsing the invariant path
    string once per record would be pure repeated work)."""
    if len(token_lists) == 1:
        return _find(payload, token_lists[0])
    columns = [_find(payload, toks) for toks in token_lists]
    counts = {len(c) for c in columns}
    if len(counts) > 1:
        raise ValueError(
            f"ragged JSON-path match counts {[len(c) for c in columns]} for "
            f"{json_path!r}: sub-record zip would scramble or drop fields"
        )
    if is_or:
        return [x for c in columns for x in c]
    n = counts.pop() if counts else 0
    return [c[i] for i in range(n) for c in columns]


def json_path_values(payload: Any, json_path: str,
                     json_path_contains_or: bool = False) -> list[Any]:
    """All matches, laid out the way jsonpath-rw would: comma-joined paths
    (AND) interleave per match group ('first n records will be first
    record'); ``|`` unions — or an explicit ``json_path_contains_or`` —
    concatenate field-major (all matches of path 1, then path 2, …), the
    layout the reference's OR transpose (``rest_api_query.py:216-231``)
    expects. Ragged per-path match counts raise: any zip of them would
    scramble fields or silently drop trailing matches."""
    paths, is_or = _expand_paths(json_path)
    is_or = is_or or json_path_contains_or
    return _values_from_tokens(
        payload, [_tokenize(p) for p in paths], is_or, json_path)


def compute_sub_records(result_list: list, field_names: list[str],
                        json_path_contains_or: bool = False) -> list[list]:
    """Exact reference zip (``rest_api_query.py:208-249``): AND → row-major
    chunks of len(field_names); OR → field-major transpose."""
    if not field_names:
        raise ValueError("Field names should not be empty")
    k = len(field_names)
    if not json_path_contains_or:
        return [result_list[i:i + k] for i in range(0, len(result_list), k)]
    n = int(len(result_list) / k)
    return [[result_list[j] for j in range(i, len(result_list), n)] for i in range(n)]


def http_failure_skip_on_status(status_codes: set[int]) -> Callable[[Exception], bool]:
    """The reference's HttpFailureSkipOnStatus policy
    (``rest_api/rest_api_failure_handlers.py``): skip records whose fetch
    raised with one of the given HTTP status codes. Works with any
    exception exposing ``status_code`` directly or via ``.response``
    (the requests.HTTPError shape)."""
    def can_skip(e: Exception) -> bool:
        code = getattr(e, "status_code", None)
        if code is None:
            code = getattr(getattr(e, "response", None), "status_code", None)
        return code in status_codes

    return can_skip


def rest_api_join(
    prev: DataFrame,
    url: str,
    json_path: str,
    field_names: list[str],
    fetch: Callable[[str], Any],
    json_path_contains_or: bool = False,
    fail_no_result: bool = False,
    skip_no_result: bool = False,
    can_skip_failure: Callable[[Exception], bool] | None = None,
    field_types: dict[str, str] | None = None,
    skip_ragged: bool = False,
) -> DataFrame:
    """One hop of the correlated join: for every row of ``prev``, build the
    URL from the row (``url.format(**record)``), fetch, JSON-path extract,
    zip into sub-records, and emit one output row per sub-record (1:N) with
    the new fields appended — the reference's execute() loop, distributed."""
    out_schema = T.StructType(
        list(prev.schema.fields)
        + [
            T.StructField(f, getattr(T, field_types[f])() if field_types and f in field_types
                          else T.StringType())
            for f in field_names
        ]
    )
    prev_cols = prev.columns
    new_types = {
        f.name: f.dataType for f in out_schema.fields if f.name in field_names
    }
    # a '|' union in the path implies OR layout even if the caller forgot
    # the flag — layout and zip must agree or fields scramble. Parse and
    # tokenize the (invariant) path ONCE, not per record in the hot loop.
    _paths, _parsed_or = _expand_paths(json_path)
    effective_or = json_path_contains_or or _parsed_or
    token_lists = [_tokenize(p) for p in _paths]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_out: list[dict] = []
            for rec in pdf.to_dict(orient="records"):
                u = url.format(**rec)
                try:
                    payload = fetch(u)
                except Exception as e:  # noqa: BLE001 — policy hook decides
                    if can_skip_failure and can_skip_failure(e):
                        continue
                    raise
                try:
                    matches = _values_from_tokens(
                        payload, token_lists, effective_or, json_path)
                except ValueError:
                    # one record with a missing optional field must not
                    # abort the whole extraction when the caller opts into
                    # per-record degradation (the reference degrades
                    # per-record); default stays fail-loud
                    if skip_ragged:
                        continue
                    raise
                if not matches:
                    if fail_no_result:
                        raise RuntimeError(
                            f"No result from URL: {u}, JSONPATH: {json_path}"
                        )
                    if skip_no_result:
                        continue
                    rows_out.append({**rec, **{f: None for f in field_names}})
                    continue
                for sub in compute_sub_records(matches, field_names,
                                               effective_or):
                    if not sub or len(sub) != len(field_names):
                        continue  # reference skips ragged sub-records
                    rows_out.append({**rec, **dict(zip(field_names, sub))})
            out = pd.DataFrame(rows_out, columns=prev_cols + field_names)
            for f, dt in new_types.items():
                if f not in out.columns:
                    continue
                if isinstance(dt, T.LongType):
                    out[f] = out[f].astype("Int64")
                elif isinstance(dt, T.StringType):
                    # JSON payloads carry ints/bools/objects; a string-typed
                    # field JSON-encodes structure and str()s scalars (the
                    # reference does str(record[...]) at use sites) so nested
                    # hops can re-parse with from_json
                    out[f] = out[f].map(
                        lambda v: v if v is None or isinstance(v, str)
                        else json.dumps(v) if isinstance(v, (dict, list))
                        else str(v)
                    )
            yield out

    return prev.mapInPandas(run, schema=out_schema)
