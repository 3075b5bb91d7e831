"""Transformer action-program compiler.

The reference executes an ordered action program per event
(pkg/interceptor/transformer/transformer.go:85-95, actions.go:51-66):
steps are simple actions or if/then/else conditionals; ``return()``
short-circuits the rest of the program for that row; ``dropEvent()``
drops the row; per-action ``ignoreError`` / ``dropIfError`` policies
(action/action.go:33-38,110-120).

Here the whole program compiles to column expressions over one
DataFrame pass. Row-level control flow becomes hidden boolean columns:

* ``_dropped``  — set by dropEvent(); rows filtered at the end
* ``_returned`` — set by return(); gates every later action via
  ``F.when`` so short-circuit semantics hold per row
* ``_errored``  — set when an action fails without ignoreError /
  dropIfError: the remaining program is skipped for that row and the
  event is forwarded as-is (Actions.Exec aborts on the first error,
  actions.go:51-66; Intercept still invokes, transformer.go:85-95)

No per-row Python executes: every action is a Catalyst expression
(regex/split/cast/concat/...), so the program stays inside whole-stage
codegen.

Program shape (mirrors the YAML in the reference's example configs,
pkg/interceptor/transformer/example/pipeline.yml):

    [
      {"action": "regex(body)", "pattern": "(?<ip>\\S+) ..."},
      {"if": "equal(status, 404)",
       "then": [{"action": "add(topic, not_found)"}],
       "else": [{"action": "add(topic, common)"}]},
      {"action": "dropEvent()"},
    ]
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loggie_spark.expr import compile_condition, parse_call
from loggie_spark.fieldpath import col_for_path, flat_name, parse_path
from loggie_spark.patterns import (
    compile_pattern,
    expand_grok,
    go_layout_to_jvm,
    named_groups,
    normalize_named_groups,
)

DROPPED = "_dropped"
RETURNED = "_returned"
ERRORED = "_errored"
CONTROL_COLS = (DROPPED, RETURNED, ERRORED)

_NAMED_GROUP_ANY = re.compile(r"\(\?P?<([a-zA-Z][a-zA-Z0-9_]*)>")


def _java_pattern(pattern: str) -> str:
    """Java regex wants ``(?<n>…)``; strip the Python ``P``."""
    return _NAMED_GROUP_ANY.sub(r"(?<\1>", normalize_named_groups(pattern))


@dataclass
class _Ctx:
    """Mutable compile state threaded through the program."""

    df: DataFrame
    gate: Column  # row must satisfy this for the action to apply
    gate_is_total: bool  # True ⇒ gate is literally "not returned/dropped yet"
    program_has_control: bool = False
    time_col: Column | None = None  # deterministic ${+...} rendering
    env: dict[str, str] | None = None
    seq: int = 0  # unique-temp-column counter

    def next_tmp(self, tag: str) -> str:
        self.seq += 1
        return f"__{tag}_{self.seq}"

    def existing(self, name: str) -> Column | None:
        return F.col(name) if name in self.df.columns else None

    def set_col(self, name: str, value: Column) -> None:
        old = self.existing(name)
        if self.gate_is_total and not self.program_has_control:
            self.df = self.df.withColumn(name, value)
        else:
            if old is not None:
                # Type-changing overwrite (strconv/timestamp): ungated
                # rows keep the old value coerced with try_cast — the
                # implicit ANSI Cast the CaseWhen would insert throws on
                # malformed rows that the gate is excluding on purpose.
                old_t = self.df.schema[name].dataType
                new_t = self.df.select(value.alias("_probe")).schema[0].dataType
                fallback = old if old_t == new_t else old.try_cast(new_t)
            else:
                fallback = F.lit(None)
            self.df = self.df.withColumn(name, F.when(self.gate, value).otherwise(fallback))

    def del_col(self, name: str) -> None:
        if name not in self.df.columns:
            return
        if self.gate_is_total and not self.program_has_control:
            self.df = self.df.drop(name)
        else:
            self.df = self.df.withColumn(
                name, F.when(self.gate, F.lit(None)).otherwise(F.col(name))
            )

    def apply_error_policy(self, failed: Column, extra: dict) -> None:
        """Per-action error policy (action.go:110-128):

        * ``dropIfError``  — failing rows are dropped (ErrorDropEvent);
        * ``ignoreError``  — failure swallowed, program continues;
        * default          — the remaining program is SKIPPED for that
          row (Actions.Exec returns the error, actions.go:56-63) and
          the event forwards as-is — ``_errored`` gates later steps.
        """
        hit = self.gate & F.coalesce(failed, F.lit(False))
        if extra.get("dropIfError"):
            self.df = self.df.withColumn(DROPPED, F.col(DROPPED) | hit)
        elif not extra.get("ignoreError"):
            self.df = self.df.withColumn(ERRORED, F.col(ERRORED) | hit)
            # Errored rows SURVIVE, so later writes must be gated off
            # them — force the conditional write path from here on.
            self.program_has_control = True


def _materialize(
    ctx: _Ctx,
    cols: dict[str, Column],
    tag: str,
    miss: dict[str, Column] | None = None,
) -> tuple[dict[str, Column], list[str]]:
    """Evaluate ``cols`` once per row behind an inline() Generate
    barrier, gated on ctx.gate (lazy CaseWhen — ungated rows never run
    the computation). Returns (attribute refs, temp names to drop).

    Catalyst's CollapseProject re-inlines expressions into every
    downstream reference; for expensive parses (regex/from_json) that
    multiplies work by the reference count. Generate output is plain
    attributes, free to reference any number of times.

    ``miss`` supplies the typed per-field value for ungated rows
    (default: string null).
    """
    prefix = ctx.next_tmp(tag)
    names = {k: f"{prefix}_{k}" for k in cols}
    hit = F.struct(*[v.alias(names[k]) for k, v in cols.items()])
    miss = miss or {}
    miss_struct = F.struct(
        *[
            miss.get(k, F.lit(None).cast("string")).alias(names[k])
            for k in cols
        ]
    )
    gate = ctx.gate if not (ctx.gate_is_total and not ctx.program_has_control) else None
    arr = F.array(hit if gate is None else F.when(gate, hit).otherwise(miss_struct))
    ctx.df = ctx.df.select("*", F.inline(arr))
    return {k: F.col(n) for k, n in names.items()}, list(names.values())


ActionFn = Callable[[_Ctx, list[str], dict], None]
_ACTIONS: dict[str, ActionFn] = {}


def register_action(name: str) -> Callable[[ActionFn], ActionFn]:
    def deco(fn: ActionFn) -> ActionFn:
        _ACTIONS[name] = fn
        return fn

    return deco


# --------------------------------------------------------------------------
# Simple setters / movers (action/{add,set,copy,move,del,underroot}.go)
# --------------------------------------------------------------------------


@register_action("add")
@register_action("set")
def _add(ctx: _Ctx, args: list[str], extra: dict) -> None:
    ctx.set_col(flat_name(args[0]), F.lit(args[1]))


@register_action("setInt")
def _set_int(ctx: _Ctx, args: list[str], extra: dict) -> None:
    ctx.set_col(flat_name(args[0]), F.lit(int(args[1])))


@register_action("setFloat")
def _set_float(ctx: _Ctx, args: list[str], extra: dict) -> None:
    ctx.set_col(flat_name(args[0]), F.lit(float(args[1])))


@register_action("setBool")
def _set_bool(ctx: _Ctx, args: list[str], extra: dict) -> None:
    ctx.set_col(flat_name(args[0]), F.lit(args[1].lower() == "true"))


@register_action("copy")
def _copy(ctx: _Ctx, args: list[str], extra: dict) -> None:
    ctx.set_col(flat_name(args[1]), col_for_path(args[0]))


@register_action("move")
@register_action("rename")
def _move(ctx: _Ctx, args: list[str], extra: dict) -> None:
    src, dst = args[0], args[1]
    if dst == "_root":  # move.go:53-61 — to=_root splices under root
        _under_root(ctx, [src], extra)
        return
    ctx.set_col(flat_name(dst), col_for_path(src))
    ctx.del_col(flat_name(src))


@register_action("del")
def _del(ctx: _Ctx, args: list[str], extra: dict) -> None:
    for a in args:
        ctx.del_col(flat_name(a))


@register_action("underRoot")
def _under_root(ctx: _Ctx, args: list[str], extra: dict) -> None:
    """Splice a struct column's fields to root (underroot.go:51-54)."""
    name = args[0]
    if not (ctx.gate_is_total and not ctx.program_has_control):
        raise ValueError("underRoot inside a conditional is not supported")
    src = flat_name(name)
    schema = dict(zip(ctx.df.columns, [f.dataType for f in ctx.df.schema.fields]))
    dtype = schema.get(src)
    if dtype is None:
        return
    from pyspark.sql.types import StructType

    if isinstance(dtype, StructType):
        for f_ in dtype.fields:
            ctx.df = ctx.df.withColumn(f_.name, F.col(src).getField(f_.name))
        ctx.df = ctx.df.drop(src)
    else:
        raise ValueError(f"underRoot target {name!r} is not a struct column")


@register_action("dropEvent")
def _drop_event(ctx: _Ctx, args: list[str], extra: dict) -> None:
    ctx.df = ctx.df.withColumn(DROPPED, F.col(DROPPED) | ctx.gate)
    ctx.program_has_control = True


@register_action("return")
def _return(ctx: _Ctx, args: list[str], extra: dict) -> None:
    ctx.df = ctx.df.withColumn(RETURNED, F.col(RETURNED) | ctx.gate)
    ctx.program_has_control = True


@register_action("print")
def _print(ctx: _Ctx, args: list[str], extra: dict) -> None:
    pass  # debug logging sink — no-op in batch (print.go:51-70)


# Batch analogs of the reference's event meta (event.go:33-35 system
# keys + source-registered addonMeta fields): column name → meta key.
_META_COLUMN_KEYS: list[tuple[str, str]] = [
    ("pipeline", "systemPipelineName"),
    ("source", "systemSourceName"),
    ("filename", "filename"),
    ("offset", "offset"),
    ("hostname", "hostname"),
    ("kafka", "kafka"),
]


@register_action("addMeta")
def _add_meta(ctx: _Ctx, args: list[str], extra: dict) -> None:
    """normalize addMeta, FULL semantics (addmeta.go:66-108): every
    non-``@private`` meta field lands under the target struct. Batch
    meta = the system columns this engine materializes (source name,
    addonMeta filename/offset/hostname, kafka addon struct) plus
    systemProductTime (the processing time column) and
    systemPipelineName (from the ``pipelineName`` extra or an existing
    ``pipeline`` column). Internal control columns are the ``@private``
    analog and never exported."""
    target = args[0] if args else extra.get("target", "meta")
    fields: list[Column] = []
    for col_name, meta_key in _META_COLUMN_KEYS:
        if col_name in ctx.df.columns:
            fields.append(F.col(col_name).alias(meta_key))
    if "pipelineName" in extra and "pipeline" not in ctx.df.columns:
        fields.append(F.lit(extra["pipelineName"]).alias("systemPipelineName"))
    ptime = ctx.time_col if ctx.time_col is not None else F.current_timestamp()
    fields.append(ptime.alias("systemProductTime"))
    ctx.set_col(flat_name(target), F.struct(*fields))


# --------------------------------------------------------------------------
# Parsers: regex / grok / split / jsonDecode / jsonEncode
# --------------------------------------------------------------------------


# Multi-byte sentinel for the single-pass extraction (see _apply_regex);
# collision with real log content is negligible and only degrades to a
# non-match for that row.
_XSEP = "\x01\x00\x02"
_XMARK = "\x02\x06\x03"


def _apply_regex(ctx: _Ctx, key: str, to: str | None, pattern: str, extra: dict) -> None:
    """Named-group extraction in ONE regex pass.

    N × regexp_extract re-runs the automaton per group (measured 6-15×
    slower at 1M rows). Instead: regexp_replace the whole line with
    '$1SEP$2SEP...' and split — one pass, pure JVM, whole-stage codegen.
    A lazy ``^.*?`` prefix emulates Go's unanchored leftmost
    FindStringSubmatch (regex.go:70-116); match success is detected by
    the split arity.
    """
    src = col_for_path(key).cast("string")
    groups = named_groups(pattern)
    jpat = _java_pattern(pattern)
    n = len(groups)

    wrapped = jpat
    if not wrapped.startswith("^"):
        wrapped = "^(?s).*?" + wrapped
    if not wrapped.endswith("$"):
        wrapped = wrapped + "(?s).*$"
    # Leading marker disambiguates a real match from a line that merely
    # splits into n parts (critical for single-group patterns, where a
    # non-matching line is itself a 1-element split).
    repl = _XMARK + _XSEP + _XSEP.join(f"${i}" for i in range(1, n + 1))

    parts = F.split(F.regexp_replace(src, wrapped, repl), _XSEP)

    # Materialize the split ARRAY once behind an inline() Generate
    # barrier. Without it, Catalyst's collapsed projections re-evaluate
    # the regex for every downstream reference (each group column, each
    # sink struct in the fan-out) — measured 8-50× regex re-runs per
    # row on the flagship. Materializing the array (not one struct
    # field per group) matters too: struct fields inside a Generate get
    # no subexpression elimination, so n groups would still run the
    # automaton n+1 times per row (measured 4.9 s → 0.9 s on
    # pl_grok_parse and 3.6 s → 0.8 s on pl_regex_route_metrics at
    # sf0.1 from this change alone). Generate output is a plain
    # attribute; the per-group F.get()s on it are free.
    attrs, temps = _materialize(
        ctx,
        {"__parts": parts},
        "rx",
        miss={"__parts": F.lit(None).cast("array<string>")},
    )
    parr = attrs["__parts"]
    # coalesce: a NULL body (or an ungated row's NULL array) yields
    # NULL size/get (Spark 4 ANSI), but the reference's GetString("")
    # → no-match → action error semantics need a definite False here.
    matched = F.coalesce(
        (F.size(parr) == n + 1) & (F.get(parr, 0) == _XMARK), F.lit(False)
    )

    ignore_blank = extra.get("ignoreBlank", False)
    out_cols: dict[str, Column] = {}
    for gname, gidx in groups.items():
        val = F.get(parr, gidx)
        if ignore_blank:
            val = F.when(val == "", F.lit(None)).otherwise(val)
        out_cols[gname] = F.when(matched, val)

    if to:
        ctx.set_col(flat_name(to), F.struct(*[v.alias(k) for k, v in out_cols.items()]))
    else:
        for k, v in out_cols.items():
            ctx.set_col(k, v)
    # regex.go:90-115 deletes the source key after a root extract
    if extra.get("deleteSrc", False) and key != "body":
        ctx.del_col(flat_name(key))
    ctx.apply_error_policy(~matched, extra)
    ctx.df = ctx.df.drop(*temps)


@register_action("regex")
def _regex(ctx: _Ctx, args: list[str], extra: dict) -> None:
    to = args[1] if len(args) > 1 else None
    _apply_regex(ctx, args[0], to, extra["pattern"], extra)


@register_action("grok")
def _grok(ctx: _Ctx, args: list[str], extra: dict) -> None:
    # grok.go:125-148 — expand %{...} macros at plan time, then regex.
    # Macro precedence (grok.go:150-163): defaults < patternPaths files
    # < inline pattern dict.
    from loggie_spark.patterns import DEFAULT_GROK_PATTERNS, load_grok_pattern_paths

    from_files = (
        load_grok_pattern_paths(extra["patternPaths"])
        if extra.get("patternPaths")
        else {}
    )
    pats = {**DEFAULT_GROK_PATTERNS, **from_files, **(extra.get("patterns") or {})}
    pattern = expand_grok(extra["match"], patterns=pats)
    to = args[1] if len(args) > 1 else None
    merged_extra = {"ignoreBlank": extra.get("ignoreBlank", True), **extra}
    _apply_regex(ctx, args[0], to, pattern, merged_extra)


@register_action("split")
def _split(ctx: _Ctx, args: list[str], extra: dict) -> None:
    # split.go:72-100 — SplitN + zip with keys; arity mismatch = error.
    key = args[0]
    to = args[1] if len(args) > 1 else None
    sep: str = extra["separator"]
    keys: list[str] = extra["keys"]
    max_n: int = extra.get("max", -1)
    src = col_for_path(key).cast("string")
    # Java split limit: -1 = no limit; loggie max = number of pieces.
    parts = F.split(src, re.escape(sep), max_n if max_n > 0 else -1)
    failed = F.size(parts) != len(keys)
    # F.get (not getItem): ANSI mode throws on out-of-bounds subscripts
    # and arity-mismatched rows would kill the job instead of following
    # the error policy.
    if to:
        ctx.set_col(
            flat_name(to),
            F.struct(*[F.get(parts, i).alias(k) for i, k in enumerate(keys)]),
        )
    else:
        for i, k in enumerate(keys):
            ctx.set_col(flat_name(k), F.when(~failed, F.get(parts, i)))
    ctx.apply_error_policy(failed, extra)


@register_action("jsonDecode")
def _json_decode(ctx: _Ctx, args: list[str], extra: dict) -> None:
    """Parse a JSON field (jsondecode.go:60-89).

    The reference is schemaless; Spark wants a schema. Two modes:
    * ``schema`` extra (DDL string) → typed struct, spliced to root or
      under ``to``.
    * no schema → ``map<string,string>`` parse; root splice requires a
      ``fields`` list naming the keys to lift.
    """
    key = args[0]
    to = args[1] if len(args) > 1 else None
    src = col_for_path(key).cast("string")
    schema = extra.get("schema")

    if schema:
        import pyspark.sql.types as T

        parsed = F.from_json(src, schema)
        struct_t = T._parse_datatype_string(schema)
        field_names = [f_.name for f_ in struct_t.fields]
        miss_parsed = F.lit(None).cast(struct_t)
        getter = lambda p, n: p.getField(n)  # noqa: E731
    else:
        parsed = F.from_json(src, "map<string,string>")
        field_names = extra.get("fields") or []
        miss_parsed = F.lit(None).cast("map<string,string>")
        getter = lambda p, n: p.getItem(n)  # noqa: E731
        if to is None and not field_names:
            raise ValueError("schemaless jsonDecode to root needs a 'fields' list")

    if to:
        failed = parsed.isNull() & src.isNotNull()
        ctx.apply_error_policy(failed, extra)
        ctx.set_col(flat_name(to), parsed)
    else:
        # One from_json per row via the Generate barrier, not one per
        # lifted field: materialize the PARSED VALUE itself (struct
        # fields inside the Generate get no subexpression elimination,
        # so one struct field per lifted key would still run from_json
        # n+1 times — same lesson as _apply_regex's array).
        attrs, temps = _materialize(
            ctx, {"__parsed": parsed}, "js", miss={"__parsed": miss_parsed}
        )
        pattr = attrs["__parsed"]
        failed = pattr.isNull() & src.isNotNull()
        ctx.apply_error_policy(failed, extra)
        for n in field_names:
            ctx.set_col(flat_name(n), getter(pattr, n))
        ctx.df = ctx.df.drop(*temps)

    if extra.get("deleteSrc", True) and key != "body":
        ctx.del_col(flat_name(key))


@register_action("jsonEncode")
def _json_encode(ctx: _Ctx, args: list[str], extra: dict) -> None:
    key = args[0]
    to = args[1] if len(args) > 1 else key
    ctx.set_col(flat_name(to), F.to_json(col_for_path(key)))


# --------------------------------------------------------------------------
# String / type transforms
# --------------------------------------------------------------------------


@register_action("replace")
def _replace(ctx: _Ctx, args: list[str], extra: dict) -> None:
    key = args[0]
    old, new = extra["old"], extra["new"]
    max_n = int(extra.get("max", -1))
    src = col_for_path(key).cast("string")
    if max_n < 0:
        ctx.set_col(flat_name(key), F.replace(src, F.lit(old), F.lit(new)))
    else:
        # Replace only the first max_n occurrences: split with limit
        # max_n+1 (Java semantics: last element keeps the remainder,
        # untouched separators included) and rejoin with the new text.
        parts = F.split(src, re.escape(old), max_n + 1)
        ctx.set_col(flat_name(key), F.array_join(parts, new))


@register_action("replaceRegex")
def _replace_regex(ctx: _Ctx, args: list[str], extra: dict) -> None:
    key = args[0]
    src = col_for_path(key).cast("string")
    ctx.set_col(flat_name(key), F.regexp_replace(src, extra["expression"], extra["replace"]))


@register_action("strconv")
def _strconv(ctx: _Ctx, args: list[str], extra: dict) -> None:
    # strconv.go:64-74 — string → bool/int/float, error when invalid.
    #
    # keepOriginal=True maps normalize/convert.go:101-131: the reference
    # stores into a dynamic map, so a failed parse KEEPS the original
    # string while successes hold the typed value. A typed Spark column
    # can't hold both, so the faithful mapping is a STRING column:
    # successes render canonically (ints base-10, floats Go-'g' via
    # gofmt, bools true/false — i.e. what the reference's json/toStr
    # sink encoding would emit) and failures keep the original bytes.
    # Documented divergences from Go parsing: Spark's try_cast trims
    # surrounding whitespace (Go ParseInt(" 7") fails) and accepts
    # y/yes/n/no for bools (Go ParseBool doesn't).
    key, typ = args[0], args[1]
    spark_t = {"bool": "boolean", "int": "long", "float": "double"}[typ]
    src = col_for_path(key)
    cast = src.try_cast(spark_t)  # ANSI-safe: malformed → null → error policy
    if extra.get("keepOriginal"):
        from loggie_spark.functions.gofmt import go_float_str

        if typ == "float":
            rendered = go_float_str(cast)
        elif typ == "bool":
            # Two-sided when: a NULL cast must stay NULL (otherwise()
            # would swallow parse failures into 'false').
            rendered = F.when(cast, "true").when(~cast, "false")
        else:
            rendered = cast.cast("string")
        ctx.set_col(flat_name(key), F.coalesce(rendered, src.cast("string")))
        return
    failed = cast.isNull() & src.isNotNull()
    # Policy must be applied BEFORE the overwrite: Column exprs resolve
    # by name at use-time, so after set_col 'failed' would see the new
    # (already-cast) column and never fire.
    ctx.apply_error_policy(failed, extra)
    ctx.set_col(flat_name(key), cast)


@register_action("toStr")
def _to_str(ctx: _Ctx, args: list[str], extra: dict) -> None:
    """tostr.go:123-152: bools → "true"/"false", ints → base-10, floats
    → Go 'g' shortest formatting (functions/gofmt.py reproduces
    strconv.FormatFloat(v, 'g', -1, bits) in Catalyst)."""
    from pyspark.sql.types import DoubleType, FloatType

    from loggie_spark.functions.gofmt import go_float_str

    src = col_for_path(args[0])
    dtype = ctx.df.select(src.alias("_probe")).schema[0].dataType
    if isinstance(dtype, (DoubleType, FloatType)):
        out = go_float_str(src)
    else:
        out = src.cast("string")
    ctx.set_col(flat_name(args[0]), out)


@register_action("timestamp")
def _timestamp(ctx: _Ctx, args: list[str], extra: dict) -> None:
    """Reparse a time field between layouts / unix / unix_ms
    (action/timestamp.go:72-116; Go layouts → JVM via go_layout_to_jvm).

    ``fromLocation``/``toLocation`` (timestamp.go:97-109, IANA names):
    the input wall time is interpreted in fromLocation (unless the
    layout itself carries a zone) and the output rendered in
    toLocation. The session timezone is UTC (session.py), so
    ``to_utc_timestamp``/``from_utc_timestamp`` implement exactly Go's
    ParseInLocation → timeutil.Format(loc) pair.
    """
    key = args[0]
    from_layout = extra.get("fromLayout", "")
    to_layout = extra.get("toLayout", "")
    from_loc = extra.get("fromLocation", "")
    to_loc = extra.get("toLocation", "")
    src = col_for_path(key)

    if from_layout == "unix":
        ts = F.timestamp_seconds(src.try_cast("long"))
    elif from_layout == "unix_ms":
        ts = F.timestamp_millis(src.try_cast("long"))
    else:
        ts = F.try_to_timestamp(src.cast("string"), F.lit(go_layout_to_jvm(from_layout)))
        if from_loc and from_loc != "UTC":
            # Layouts with an explicit zone already parse absolutely;
            # fromLocation applies to zone-less wall times (Go
            # ParseInLocation semantics — zone in the string wins).
            ts = F.to_utc_timestamp(ts, from_loc)

    failed = ts.isNull() & src.isNotNull()
    ctx.apply_error_policy(failed, extra)  # before overwrite (name-resolution)
    if to_layout == "unix":
        out = ts.cast("long")
    elif to_layout == "unix_ms":
        out = F.unix_millis(ts)
    else:
        rendered = F.from_utc_timestamp(ts, to_loc) if to_loc and to_loc != "UTC" else ts
        out = F.date_format(rendered, go_layout_to_jvm(to_layout))
    ctx.set_col(flat_name(key), out)


@register_action("fmt")
def _fmt(ctx: _Ctx, args: list[str], extra: dict) -> None:
    ctx.set_col(
        flat_name(args[0]),
        compile_pattern(extra["pattern"], time_col=ctx.time_col, env=ctx.env),
    )


@register_action("fmtKey")
def _fmt_key(ctx: _Ctx, args: list[str], extra: dict) -> None:
    # fmtkey.go:83-101 — rename keys matching regex; plan-time rename.
    if not (ctx.gate_is_total and not ctx.program_has_control):
        raise ValueError("fmtKey inside a conditional is not supported")
    pat = re.compile(extra["regex"])
    repl = extra["replace"]
    for c in list(ctx.df.columns):
        if c in CONTROL_COLS:
            continue
        new = pat.sub(repl, c)
        if new != c:
            ctx.df = ctx.df.withColumnRenamed(c, new)


# --------------------------------------------------------------------------
# Program driver
# --------------------------------------------------------------------------


@dataclass
class CompiledProgram:
    """Result of compiling an action program against a DataFrame."""

    df: DataFrame
    dropped_col: str = DROPPED

    def finish(self, keep_control_cols: bool = False) -> DataFrame:
        out = self.df.filter(~F.col(DROPPED))
        if not keep_control_cols:
            out = out.drop(*CONTROL_COLS)
        return out


def apply_program(
    df: DataFrame,
    program: list[dict],
    time_col: Column | None = None,
    env: dict[str, str] | None = None,
) -> CompiledProgram:
    """Compile + attach an action program to ``df``.

    Returns a :class:`CompiledProgram`; call ``.finish()`` to filter
    dropped rows and strip control columns.
    """
    for c in CONTROL_COLS:
        df = df.withColumn(c, F.lit(False))
    ctx = _Ctx(
        df=df,
        gate=~F.col(DROPPED) & ~F.col(RETURNED) & ~F.col(ERRORED),
        gate_is_total=True,
        time_col=time_col,
        env=env,
    )
    _apply_steps(ctx, program, extra_gate=None)
    return CompiledProgram(df=ctx.df)


def _apply_steps(ctx: _Ctx, steps: list[dict], extra_gate: Column | None) -> None:
    for step in steps:
        if "if" in step:
            # Three-valued logic guard: a condition over a missing/null
            # field is NULL in SQL, but the reference's eventops treats
            # it as false (GetString on a missing key → ""). Without
            # this, NULL gates poison _dropped/_returned and silently
            # drop unparsed rows.
            cond = F.coalesce(compile_condition(step["if"]), F.lit(False))
            then_gate = cond if extra_gate is None else (extra_gate & cond)
            else_gate = ~cond if extra_gate is None else (extra_gate & ~cond)
            # Conditionals introduce partial gates for everything below.
            ctx.program_has_control = True
            for sub in step.get("then", []) or []:
                _apply_one(ctx, sub, then_gate)
            for sub in step.get("else", []) or []:
                _apply_one(ctx, sub, else_gate)
        else:
            _apply_one(ctx, step, extra_gate)


def _apply_one(ctx: _Ctx, step: dict, extra_gate: Column | None) -> None:
    call = step["action"]
    name, args = parse_call(call)
    if name not in _ACTIONS:
        raise KeyError(f"unknown action: {name}")
    extra = {k: v for k, v in step.items() if k != "action"}
    base_gate = ~F.col(DROPPED) & ~F.col(RETURNED) & ~F.col(ERRORED)
    ctx.gate = base_gate if extra_gate is None else (base_gate & extra_gate)
    ctx.gate_is_total = extra_gate is None
    _ACTIONS[name](ctx, args, extra)
