"""Row transformers — the reference's Transformer inventory as DataFrame ops.

Each reference transformer (``databuilder/transformer/*``, SURVEY §2.2) is a
record-at-a-time Python callable; here each is a function DataFrame →
DataFrame built from JVM expressions (return-None filtering becomes a
``where``; iterator fan-out becomes ``explode``). ``ChainedTransformer``
becomes plain composition.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]


def chain(*transforms: Transform) -> Transform:
    """``ChainedTransformer`` (``base_transformer.py:42-84``)."""

    def apply(df: DataFrame) -> DataFrame:
        for t in transforms:
            df = t(df)
        return df

    return apply


def literal_replace(cols: list[str], replace: str, replacement: str) -> Transform:
    """``RegexStrReplaceTransformer`` (``regex_str_replace_transformer.py:19``)
    — despite the reference's name it is a LITERAL ``str.replace`` (:41-43);
    ``F.replace`` preserves that exactly (no regex interpretation)."""

    def apply(df: DataFrame) -> DataFrame:
        for c in cols:
            df = df.withColumn(c, F.replace(F.col(c), F.lit(replace), F.lit(replacement)))
        return df

    return apply


def template_substitute(field: str, template: str, inputs: list[str]) -> Transform:
    """``TemplateVariableSubstitutionTransformer``
    (``template_variable_substitution_transformer.py:17``): field =
    template.format(**record). Template uses ``{}`` placeholders in order."""
    fmt = template
    for name in inputs:
        fmt = fmt.replace("{" + name + "}", "%s")

    def apply(df: DataFrame) -> DataFrame:
        return df.withColumn(field, F.format_string(fmt, *[F.col(c) for c in inputs]))

    return apply


def timestamp_to_epoch(field: str, fmt: str | None = None) -> Transform:
    """``TimestampStringToEpoch`` (``timestamp_string_to_epoch.py:20-46``):
    parse → epoch seconds, **parse failure → 0** (:36-40)."""

    def apply(df: DataFrame) -> DataFrame:
        parsed = (
            F.try_to_timestamp(F.col(field), F.lit(fmt))
            if fmt
            else F.try_to_timestamp(F.col(field))
        )
        return df.withColumn(field, F.coalesce(F.unix_timestamp(parsed), F.lit(0)))

    return apply


def remove_fields(fields: list[str]) -> Transform:
    """``RemoveFieldTransformer`` (``remove_field_transformer.py:16``)."""

    def apply(df: DataFrame) -> DataFrame:
        return df.drop(*fields)

    return apply


def generic_udf(field: str, fn, return_type: str = "string") -> Transform:
    """``GenericTransformer`` (``generic_transformer.py:17``) — arbitrary
    per-value callback. Vectorized: ``fn`` receives/returns a pandas Series
    (Arrow-batched), never a scalar row — the reference's per-row callback is
    the anti-pattern this replaces."""
    from pyspark.sql.pandas.functions import pandas_udf

    vec = pandas_udf(fn, return_type)

    def apply(df: DataFrame) -> DataFrame:
        return df.withColumn(field, vec(F.col(field)))

    return apply


def filter_where(cond: Column) -> Transform:
    """The transform-returns-None filtering convention (``task.py:57-60``)."""

    def apply(df: DataFrame) -> DataFrame:
        return df.where(cond)

    return apply


def add_tags(field: str, job_tags: list[str]) -> Transform:
    """``TableTagTransformer`` (``table_tag_transformer.py:12``): append
    job-level tags, trimmed/lowered/deduped like ``_format_as_list``."""
    tags = [t.strip().lower() for t in job_tags]

    def apply(df: DataFrame) -> DataFrame:
        existing = F.coalesce(F.col(field), F.array().cast("array<string>"))
        return df.withColumn(
            field,
            F.array_distinct(
                F.concat(
                    F.transform(existing, lambda t: F.lower(F.trim(t))),
                    F.array(*[F.lit(t) for t in tags]),
                )
            ),
        )

    return apply


def dict_to_typed(schema_cols: dict[str, str]) -> Transform:
    """``DictToModel`` (``dict_to_model.py:17``): loose dict rows → typed
    columns (cast per target type), unknown keys dropped."""

    def apply(df: DataFrame) -> DataFrame:
        return df.select(
            *[F.col(c).cast(t).alias(c) for c, t in schema_cols.items()]
        )

    return apply
