"""Filter operators F1–F6 (SURVEY §2.3) — pure Catalyst predicates.

Every filter compiles to a DataFrame ``filter`` so Catalyst pushes it into
the parquet scan (predicate pushdown; verify with
``df.explain('formatted')`` → ``PushedFilters``). Nothing here leaves the
JVM.

Reference parity:
- F1 table filter      ``pkg/filter/filter.go:47-66,201``
- F2 event-type filter ``pkg/filter/sql_event_filter.go:43-110,181-209``
- F3 value-expr filter ``pkg/filter/expr_filter.go:39-80,249-338``
- F4 ignore-txn-ts     ``pkg/filter/filter.go:217-224``
- F5 DDL allow-list    ``pkg/filter/filter.go:226-231; ShouldDiscardDDL :167-190``
- F6 multi-stmt split  ``pkg/filter/filter.go:107-133``
"""

from __future__ import annotations

import fnmatch
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tigate_spark.config import EventFilterRule, FilterConfig

_OP_BY_EVENT = {"insert": "I", "update": "U", "delete": "D"}


def rule_to_regex(rule: str) -> tuple[str, str]:
    """One mysql-replication-rule ``schema.table`` glob → two regexes.

    Mirrors the matcher semantics of ``pkg/filter/filter.go:47-66`` (fnmatch
    on schema and table separately; ``*.*`` matches everything).
    """
    schema_glob, _, table_glob = rule.partition(".")
    if not table_glob:
        table_glob = "*"
    # '^' anchor: Spark rlike is substring-match; fnmatch.translate only
    # anchors the end (\Z).
    return "^" + fnmatch.translate(schema_glob), "^" + fnmatch.translate(table_glob)


def table_rule_match(rules: list[str], schema: str, table: str) -> bool:
    """Driver-side single-table check of the F1 rule list — same matcher
    semantics as :func:`table_filter` (``pkg/filter/filter.go:47-66``),
    for APIs that classify tables without building a plan
    (verify_table)."""
    if not rules or rules == ["*.*"]:
        return True
    for rule in rules:
        # Same regexes as the plan-side rlike filter: fnmatch.fnmatch would
        # normcase (case-insensitive off-POSIX) and the two paths could
        # diverge; one matcher keeps verify_table and table_filter in step.
        s_re, t_re = rule_to_regex(rule)
        if re.match(s_re, schema) and re.match(t_re, table):
            return True
    return False


def table_filter(df: DataFrame, rules: list[str],
                 schema_col: str = "schema_name", table_col: str = "table_name") -> DataFrame:
    """F1: keep rows whose (schema, table) matches any rule."""
    if not rules or rules == ["*.*"]:
        return df
    cond: Column = F.lit(False)
    for rule in rules:
        s_re, t_re = rule_to_regex(rule)
        cond = cond | (F.col(schema_col).rlike(s_re) & F.col(table_col).rlike(t_re))
    return df.filter(cond)


def _matcher_cond(matcher: list[str], schema_col: str, table_col: str) -> Column:
    cond: Column = F.lit(False)
    for rule in matcher or ["*.*"]:
        s_re, t_re = rule_to_regex(rule)
        cond = cond | (F.col(schema_col).rlike(s_re) & F.col(table_col).rlike(t_re))
    return cond


def event_type_filter(df: DataFrame, rule: EventFilterRule,
                      op_col: str = "op") -> DataFrame:
    """F2: drop DML whose op is in ``ignore_event`` for matching tables."""
    ops = [_OP_BY_EVENT[e] for e in rule.ignore_event if e in _OP_BY_EVENT]
    if not ops:
        return df
    matched = _matcher_cond(rule.matcher, "schema_name", "table_name")
    return df.filter(~(matched & F.col(op_col).isin(ops)))


def expr_value_filter(df: DataFrame, rule: EventFilterRule) -> DataFrame:
    """F3: drop rows where the configured SQL expr evaluates true against
    the row image — exactly tigate's ``ignore-*-value-expr``
    (``pkg/filter/expr_filter.go:249-338``), compiled by Spark's ``expr``
    instead of TiDB's expression engine.

    The expressions reference image columns directly (our canonical stream
    keeps scalar columns; typed views expose ``before.*``/``after.*``).
    """
    matched = _matcher_cond(rule.matcher, "schema_name", "table_name")
    drop: Column = F.lit(False)
    if rule.ignore_insert_value_expr:
        drop = drop | ((F.col("op") == "I") & F.expr(rule.ignore_insert_value_expr))
    if rule.ignore_update_new_value_expr:
        drop = drop | ((F.col("op") == "U") & F.expr(rule.ignore_update_new_value_expr))
    if rule.ignore_update_old_value_expr:
        drop = drop | ((F.col("op") == "U") & F.expr(rule.ignore_update_old_value_expr))
    if rule.ignore_delete_value_expr:
        drop = drop | ((F.col("op") == "D") & F.expr(rule.ignore_delete_value_expr))
    return df.filter(~(matched & drop))


def ignore_txn_start_ts(df: DataFrame, start_ts_list: list[int]) -> DataFrame:
    """F4: drop whole transactions by start_ts (``filter.go:217-224``).

    The list form matches the reference's config shape (a literal
    ignore-txn-start-ts list). When the ignore set is *data-derived*,
    use :func:`ignore_txn_start_ts_df` — no driver round-trip.
    """
    if not start_ts_list:
        return df
    return df.filter(~F.col("start_ts").isin(start_ts_list))


def ignore_txn_start_ts_df(df: DataFrame, ignore: DataFrame) -> DataFrame:
    """F4 with a DataFrame-valued ignore set: broadcast anti-join on
    start_ts — the whole filter stays in the plan (no collect), so a
    large or query-derived ignore set is fine at any scale."""
    ignore_ts = ignore.select("start_ts").distinct()
    return df.join(F.broadcast(ignore_ts), "start_ts", "left_anti")


def ddl_allowlist_filter(ddl_df: DataFrame, allowed_types: list[str],
                         type_col: str = "ddl_type") -> DataFrame:
    """F5: only allow-listed DDL classes replicate (``filter.go:226-231``)."""
    return ddl_df.filter(F.col(type_col).isin(allowed_types))


def split_multistatement_ddl(ddl_df: DataFrame, query_col: str = "query") -> DataFrame:
    """F6: split ``;``-joined DDL into one row per statement, dropping
    empties (``FilterDDLEvent``, ``filter.go:107-133``)."""
    stmt = F.explode(F.split(F.col(query_col), ";"))
    return (
        ddl_df.withColumn("stmt", stmt)
        .withColumn("stmt", F.trim(F.col("stmt")))
        .filter(F.col("stmt") != "")
        .drop(query_col)
    )


def apply_filter_config(df: DataFrame, cfg: FilterConfig) -> DataFrame:
    """Compose F1 + F4 + all event-filter rules (F2/F3) in reference order
    (table filter at scan registration, event/expr filters before sink —
    ``pkg/filter/filter.go:81-105``)."""
    out = table_filter(df, cfg.rules)
    out = ignore_txn_start_ts(out, cfg.ignore_txn_start_ts)
    for rule in cfg.event_filters:
        out = event_type_filter(out, rule)
        out = expr_value_filter(out, rule)
    return out


#: DDL statement → action type, mirroring the action switch coverage of
#: ``logservice/schemastore/persist_storage.go:812-939`` for the statement
#: shapes the engine's DDL channel carries.
DDL_ACTION_PATTERNS: list[tuple[str, str]] = [
    (r"(?i)^\s*CREATE\s+TABLE", "create table"),
    (r"(?i)^\s*DROP\s+TABLE", "drop table"),
    (r"(?i)^\s*TRUNCATE\s+TABLE", "truncate table"),
    (r"(?i)^\s*RENAME\s+TABLE", "rename table"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+ADD\s+COLUMN", "add column"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+DROP\s+COLUMN", "drop column"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+MODIFY", "modify column"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+ADD\s+INDEX", "add index"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+DROP\s+INDEX", "drop index"),
    (r"(?i)^\s*CREATE\s+(DATABASE|SCHEMA)", "create schema"),
    (r"(?i)^\s*DROP\s+(DATABASE|SCHEMA)", "drop schema"),
    (r"(?i)^\s*CREATE\s+VIEW", "create view"),
    # partition lifecycle + the remaining persist_storage.go action cases
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+ADD\s+PARTITION", "add partition"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+DROP\s+PARTITION", "drop partition"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+TRUNCATE\s+PARTITION", "truncate partition"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+EXCHANGE\s+PARTITION", "exchange partition"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+REORGANIZE\s+PARTITION", "reorganize partition"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+ALTER\s+(COLUMN\s+)?\S+\s+SET\s+DEFAULT", "set default value"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+AUTO_INCREMENT", "rebase auto id"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+SHARD_ROW_ID_BITS", "shard row id"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+ATTRIBUTES", "alter table attributes"),
    (r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+CHANGE", "modify column"),
    (r"(?i)^\s*DROP\s+VIEW", "drop view"),
]


def classify_ddl(df: DataFrame, stmt_col: str = "stmt") -> DataFrame:
    """F5/S4: classify each DDL statement into its action type (the
    dispatch key of the reference's ~30-case action switch,
    ``persist_storage.go:812-939``); unknown statements → 'other'."""
    action: Column = F.lit("other")
    for pat, name in reversed(DDL_ACTION_PATTERNS):
        action = F.when(F.col(stmt_col).rlike(pat), name).otherwise(action)
    return df.withColumn("ddl_action", action)


def ddl_sql_filter(ddl_df: DataFrame, rule: EventFilterRule,
                   query_col: str = "query") -> DataFrame:
    """F2 (DDL side): drop DDL whose query text matches any ``ignore_sql``
    regex for matching tables (``pkg/filter/sql_event_filter.go:43-110`` —
    the ``ignore-sql`` rule list; partial-match regex like the reference)."""
    if not rule.ignore_sql:
        return ddl_df
    hit: Column = F.lit(False)
    for pat in rule.ignore_sql:
        hit = hit | F.col(query_col).rlike(pat)
    return ddl_df.filter(~hit)
