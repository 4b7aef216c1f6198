"""MongoDB slow-query analysis plan (reference M3-M14).

Reproduces ``parse_log_lines`` (``Mongo/mongo_parser.py:17-131``) as
lazy DataFrame pipelines. Routing semantics are the reference's exact
(non-exclusive) control flow:

* slow-query sheet:  line contains the substring ``"Slow query"``
  (raw-line heuristic at ``Mongo/mongo_parser.py:31`` — NOT a field
  equality);
* error sheet:       ``msg`` present AND ``s == 'E'`` AND
  ``attr.error`` present (``:72``) — evaluated on every valid line,
  so a line can appear in BOTH sheets;
* passthrough sheet: valid lines that are neither (``elif`` at ``:88``);
* parse diagnostics: lines that fail to parse as a JSON object.

Deterministic "first in file order" samples use ``min_by(col,
line_no)`` — a bare ``first()`` is partition-order-dependent in a
distributed engine.

Error-route parity is exact down to the reference's exception
behavior (``Mongo/mongo_parser.py:72-94``): the predicate tests RAW
key presence (``'msg' in doc``, ``'attr' in doc``, ``'error' in
doc['attr']``), so degenerate inputs route like CPython evaluates
them —

* ``"attr"`` present but not iterable (``null``/number/bool) →
  ``TypeError`` inside the predicate → the line lands in the
  parse-error channel as ``Error parsing line: argument of type
  '<T>' is not iterable. Skipped.``;
* ``'error'`` key present but its value not an object
  (``null``/scalar/array), or ``attr`` a string/array *containing*
  ``'error'`` → ``AttributeError`` on ``error_details.get`` →
  ``Error parsing line: '<T>' object has no attribute 'get'.
  Skipped.``;
* only an object-valued ``error`` reaches the error sheet, where
  ``msg`` keeps its raw value (``None`` stays null — ``.get('msg',
  'N/A')`` never defaults when the key is present) and
  ``codeName``/``errmsg`` default to ``'N/A'`` only when the key is
  ABSENT, not when it is ``null``.

The raw-type dispatch uses Spark 4's variant introspection
(``schema_of_variant(try_variant_get(...))``) — a typed, codegen
path, evaluated once per line before the persist. Remaining known
divergence: JSON strings come from ``get_json_object``/Jackson so
they have no space after ``:``/``,`` where Python's ``json.dumps``
has one; both sides are compared JSON-semantically in tests. All
scalar work stays in whole-stage codegen; the only Python in the hot
path is the Arrow-batched line numbering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sressentials_spark.functions.normalize import normalize_mongo_command, strip_ws
from sressentials_spark.plans import SheetDict
from sressentials_spark.schemas import (
    MONGO_DETAILED_COLUMNS,
    MONGO_ERROR_COLUMNS,
    MONGO_STATS_COLUMNS,
)
from sressentials_spark.sources.mongo_log import read_mongo_log

#: Fallback Filter payloads — byte-identical to the reference's
#: ``json.dumps`` output (``Mongo/mongo_parser.py:51``).
_COMPLEX_PIPELINE = '{"pipeline_info": "Complex pipeline, see full command"}'


def _is_slow(df_or_col: Column | str = "value") -> Column:
    return F.col(df_or_col).contains("Slow query") if isinstance(df_or_col, str) else df_or_col.contains("Slow query")


def _pytype(variant_type: Column) -> Column:
    """Python type name for a ``schema_of_variant`` type string —
    the ``<T>`` CPython prints in the reference's exception messages."""
    return (
        F.when(variant_type == "VOID", "NoneType")
        .when(variant_type == "STRING", "str")
        .when(variant_type == "BIGINT", "int")
        .when(
            variant_type.startswith("DECIMAL")
            | (variant_type == "DOUBLE")
            | (variant_type == "FLOAT"),
            "float",
        )
        .when(variant_type == "BOOLEAN", "bool")
        .when(variant_type.startswith("ARRAY"), "list")
        .otherwise("dict")
    )


def with_error_routing(base: DataFrame) -> DataFrame:
    """Attach the raw-presence error-route flags (evaluated pre-persist).

    Adds a ``_route`` struct replaying ``Mongo/mongo_parser.py:72-86``
    exactly as CPython evaluates it (see module docstring):

    * ``_route.err``     — line belongs on the error sheet;
    * ``_route.exc``     — the reference throws mid-evaluation and the
      line lands in the parse-error channel instead;
    * ``_route.exc_msg`` — the ``str(e)`` of that exception.

    Cost shape: the raw-JSON probes (``json_object_keys`` ×3,
    ``try_parse_json``/``schema_of_variant`` ×2, ``get_json_object``
    ×2) are ~10× the price of the rest of the parse, and error lines
    are a small fraction of a real log. All of them live inside ONE
    ``when(candidate, struct(...))`` branch behind a cheap gate —
    substring presence of ``"msg"``/``"attr"`` (a sound *necessary*
    condition for key presence: a present key's quoted token appears
    verbatim in the line) plus the already-typed ``parsed.s == 'E'``.
    A single struct-valued column matters: subexpression elimination
    hoists subexprs shared across separate output columns
    unconditionally, which un-gates them; branch-local subexprs of one
    conditional expression stay in the branch.
    """
    value = F.col("value")
    parsed = F.col("parsed")
    candidate = (
        F.col("valid")
        & value.contains('"msg"')
        & value.contains('"attr"')
        & (F.coalesce(parsed.getField("s"), F.lit("")) == "E")
    )
    top_keys = F.json_object_keys(value)
    attr_raw = F.get_json_object(value, "$.attr")
    attr_keys = F.json_object_keys(attr_raw)
    variant = F.expr("try_parse_json(value)")
    attr_type = F.expr(
        "schema_of_variant(try_variant_get(try_parse_json(value), '$.attr'))"
    )
    err_type = F.expr(
        "schema_of_variant(try_variant_get(try_parse_json(value), '$.attr.error'))"
    )
    _ = variant  # documented: both type probes share the parse via CSE

    # 'msg' in doc AND doc.get('s','') == 'E' AND 'attr' in doc ...
    pre = (
        F.array_contains(top_keys, "msg")
        & (F.coalesce(parsed.getField("s"), F.lit("")) == "E")
        & F.array_contains(top_keys, "attr")
    )
    # ... AND 'error' in doc['attr'] — per the Python `in` operator:
    attr_is_obj = attr_keys.isNotNull()
    attr_is_str = attr_type == "STRING"
    attr_is_list = attr_type.startswith("ARRAY")
    not_iterable = ~(attr_is_obj | attr_is_str | attr_is_list)
    membership = (
        F.when(attr_is_obj, F.array_contains(attr_keys, "error"))
        .when(attr_is_str, attr_raw.contains("error"))
        .when(
            attr_is_list,
            F.coalesce(
                F.array_contains(
                    F.from_json(attr_raw, "array<string>"), F.lit("error")
                ),
                F.lit(False),
            ),
        )
        .otherwise(F.lit(False))
    )
    err_is_obj = F.json_object_keys(
        F.get_json_object(value, "$.attr.error")
    ).isNotNull()

    type_exc = pre & not_iterable
    # attr['<error>'].get(...) raised: the receiver is attr.error for an
    # object attr, attr itself for the str/list substring/member cases.
    attr_exc = pre & ~not_iterable & membership & ~err_is_obj
    receiver_type = F.when(attr_is_obj, _pytype(err_type)).otherwise(
        _pytype(attr_type)
    )
    exc_msg = (
        F.when(
            type_exc,
            F.concat(
                F.lit("argument of type '"),
                _pytype(attr_type),
                F.lit("' is not iterable"),
            ),
        )
        .when(
            attr_exc,
            F.concat(
                F.lit("'"),
                receiver_type,
                F.lit("' object has no attribute 'get'"),
            ),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    routed = F.when(
        candidate,
        F.struct(
            (pre & ~not_iterable & membership & err_is_obj).alias("err"),
            (type_exc | attr_exc).alias("exc"),
            exc_msg.alias("exc_msg"),
        ),
    ).otherwise(
        F.struct(
            F.lit(False).alias("err"),
            F.lit(False).alias("exc"),
            F.lit(None).cast("string").alias("exc_msg"),
        )
    )
    return base.withColumn("_route", routed)


def slow_query_metrics(base: DataFrame) -> DataFrame:
    """M6/M7/M8/M9 projection of slow-query lines (detailed sheet rows).

    Returns the 11 reference columns plus ``line_no`` (callers drop it
    for sheet parity; aggregations use it for deterministic samples).
    """
    parsed = F.col("parsed")
    attr = parsed.getField("attr")
    ns = F.coalesce(attr.getField("ns"), F.lit(""))
    ns_parts = F.split(ns, r"\.", -1)
    cmd = F.col("command")
    keys = F.json_object_keys(cmd)
    match0 = F.get_json_object(cmd, "$.pipeline[0].$match")

    filter_col = (
        F.when(F.array_contains(keys, "pipeline"), F.coalesce(match0, F.lit(_COMPLEX_PIPELINE)))
        .when(
            F.array_contains(keys, "filter"),
            F.coalesce(F.get_json_object(cmd, "$.filter"), F.lit("{}")),
        )
        .otherwise(F.lit("{}"))
    )

    def metric(name: str) -> Column:
        return F.coalesce(attr.getField(name), F.lit(0))

    return base.filter(F.col("valid") & _is_slow("value")).select(
        F.col("line_no"),
        cmd.alias("Command"),
        F.when(F.size(ns_parts) > 1, F.element_at(ns_parts, 2)).otherwise("N/A").alias("Collection"),
        F.element_at(ns_parts, 1).alias("AppName"),
        metric("durationMillis").alias("Duration(ms)"),
        metric("keysExamined").alias("KeysExamined"),
        metric("docsExamined").alias("DocsExamined"),
        metric("numYields").alias("numYields"),
        metric("nreturned").alias("nreturned"),
        filter_col.alias("Filter"),
        F.coalesce(attr.getField("planSummary"), F.lit("")).alias("Plan"),
        F.coalesce(parsed.getField("t").getField("$date"), F.lit("")).alias("timestamp"),
    )


def query_pattern_stats(metrics: DataFrame) -> DataFrame:
    """M10 + M12: group by normalized command, stats + first sample."""
    return (
        metrics.withColumn("Query Pattern", normalize_mongo_command(F.col("Command")))
        .groupBy("Query Pattern")
        .agg(
            F.count(F.lit(1)).alias("Executions"),
            F.min("Duration(ms)").alias("Min Duration(ms)"),
            F.max("Duration(ms)").alias("Max Duration(ms)"),
            F.round(F.avg("Duration(ms)"), 2).alias("Avg Duration(ms)"),
            F.min_by("Command", "line_no").alias("Sample Full Query"),
        )
        .select(*MONGO_STATS_COLUMNS)
        .orderBy(F.desc("Executions"), F.desc("Avg Duration(ms)"))
    )


def error_rollup(base: DataFrame) -> DataFrame:
    """M11: group errors by (msg, codeName, errmsg); first line + sample.

    ``msg`` keeps its raw value (``.get('msg','N/A')`` never defaults —
    the route requires the key present — so ``"msg": null`` stays
    null); ``codeName``/``errmsg`` default to ``'N/A'`` only when the
    key is ABSENT from the error object (``Mongo/mongo_parser.py:76-78``).
    """
    parsed = F.col("parsed")
    err = parsed.getField("attr").getField("error")
    err_keys = F.json_object_keys(F.get_json_object("value", "$.attr.error"))

    def err_field(name: str) -> Column:
        return F.when(
            F.array_contains(err_keys, name), err.getField(name)
        ).otherwise(F.lit("N/A"))

    return (
        base.filter(F.col("_route.err"))
        .select(
            F.col("line_no"),
            strip_ws("value").alias("raw_line"),
            parsed.getField("msg").alias("msg"),
            err_field("codeName").alias("error"),
            err_field("errmsg").alias("errmsg"),
        )
        .groupBy("msg", "error", "errmsg")
        .agg(
            F.min("line_no").alias("OriginalLineNumber"),
            F.count(F.lit(1)).alias("totalCount"),
            F.min_by("raw_line", "line_no").alias("SampleLine"),
        )
        .select(*MONGO_ERROR_COLUMNS)
        .orderBy("OriginalLineNumber")
    )


def non_slow_passthrough(base: DataFrame) -> DataFrame:
    """M5: valid lines that matched neither route (file order).

    Lines whose error-route evaluation threw in the reference never
    reach its passthrough ``elif`` — they are excluded here too.
    """
    keep = (
        F.col("valid")
        & ~_is_slow("value")
        & ~F.col("_route.err")
        & ~F.col("_route.exc")
    )
    return base.filter(keep).orderBy("line_no").select(strip_ws("value").alias("LogLine"))


def parse_error_messages(base: DataFrame) -> DataFrame:
    """M14: diagnostics — invalid JSON lines plus lines whose error-route
    evaluation raised (``except Exception`` at ``Mongo/mongo_parser.py:93-94``),
    interleaved in file order."""
    message = F.when(
        ~F.col("valid"),
        F.concat(F.lit("Line "), F.col("line_no"), F.lit(": Invalid JSON. Skipped.")),
    ).otherwise(
        F.concat(
            F.lit("Line "),
            F.col("line_no"),
            F.lit(": Error parsing line: "),
            F.col("_route.exc_msg"),
            F.lit(". Skipped."),
        )
    )
    return (
        base.filter(~F.col("valid") | F.col("_route.exc"))
        .orderBy("line_no")
        .select(message.alias("message"))
    )


def analyze_mongo_log(spark: SparkSession, path: str, cache: bool = True) -> SheetDict:
    """Full 4-sheet analysis + diagnostics (reference ``parse_log_lines``).

    Returns lazy DataFrames keyed ``detailed / query_stats / non_slow /
    errors / parse_errors``. ``cache=True`` persists the parsed base
    (routing flags included, so variant probing runs once per line) so
    materializing all five sheets scans the file once. The persisted
    root is attached as ``.base`` (see
    :class:`sressentials_spark.plans.SheetDict`).
    """
    base = with_error_routing(read_mongo_log(spark, path))
    if cache:
        base = base.persist()
    metrics = slow_query_metrics(base)
    return SheetDict(
        {
            "detailed": metrics.orderBy("line_no").select(*MONGO_DETAILED_COLUMNS),
            "query_stats": query_pattern_stats(metrics),
            "non_slow": non_slow_passthrough(base),
            "errors": error_rollup(base),
            "parse_errors": parse_error_messages(base),
        },
        base=base if cache else None,
    )
