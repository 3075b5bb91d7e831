"""Go-compatible float rendering — strconv.FormatFloat(v, 'g', -1, bits)
as a Catalyst expression (tostr.go:123-152 convertStr).

Both Java's ``Double.toString`` and Go's shortest-'g' emit the SAME
shortest-round-trip digit sequence; only the surface formatting rules
differ:

* Java: scientific when exp >= 7 or exp < -3, mantissa always keeps a
  trailing ``.0``, exponent spelled ``E8``.
* Go 'g' (shortest): scientific when exp < -4 or exp >= 6
  (strconv/ftoa.go: ``if shortest { eprec = 6 }``), no trailing
  ``.0``, exponent spelled ``e+08`` (sign + ≥2 digits).

So the strategy is: let Spark's cast produce the Java repr (shortest
digits for free, JVM-side), then re-assemble those digits under Go's
rules with string expressions — no Python per row.

Expression-size note: the assembly references the digit string ~8
times and the decimal exponent ~7 times. Building it as one Column
tree re-inlines the full parse chain into every reference —
measured ~1000+ node trees whose generated Java overflows janino
(64 KB / deep-if limits), so Spark silently falls back to an
INTERPRETED Project that re-evaluates each repeated subtree per row.
``_let`` binds each intermediate as a higher-order-function lambda
variable (``element_at(transform(array(x), f), 1)``) so it is
computed once per row and the tree stays linear-size: ~20% faster
locally, an 8× smaller plan, and no codegen-failure log storm at
scale.

Known divergence: JDK Double.toString historically emits a non-shortest
digit string for a few subnormals (e.g. 4.9E-324 where Go says
5e-324); log pipelines never see subnormals, documented not fixed.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

_BIG = 1 << 30  # "rest of string" length for substring


def let_bind(val: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``val`` once per row as a lambda variable and evaluate
    ``body`` against it — the Column-level analog of a ``let``.

    Catalyst re-inlines plain Column references into every use site
    (there is no expression-level CSE inside CaseWhen branches), so an
    intermediate referenced N times is COMPUTED N times — and worse,
    deep trees overflow janino's method limits and drop the whole
    Project out of codegen. Routing the value through a one-element
    ``transform`` makes it a ``NamedLambdaVariable``: evaluated once,
    referenced cheaply, immune to re-inlining. No optimizer rule
    rewrites ``element_at(transform(array(x), f), 1)`` back into
    ``f(x)``. Bind a struct to introduce several values at once.
    """
    return F.element_at(F.transform(F.array(val), body), 1)


def _digits_and_exp(a: Column) -> tuple[Column, Column]:
    """Shortest digit string (no sign/dot/zeros) + decimal exponent of
    the leading digit (dp - 1 in ftoa.go terms) from the unsigned Java
    repr ``a`` ("200.1", "1.0E-5", "100.0")."""
    has_e = a.contains(F.lit("E"))
    mant = F.substring_index(a, "E", 1)
    digits_raw = F.replace(mant, F.lit("."), F.lit(""))
    # Shortest digits: strip leading zeros (plain "0.00123" forms) and
    # trailing zeros ("100.0" → "1", "1.0E-5" → "1").
    d = F.regexp_replace(F.regexp_replace(digits_raw, "^0+", ""), "0+$", "")
    int_part = F.substring_index(mant, ".", 1)
    frac_part = F.substring_index(mant, ".", -1)
    plain_exp = F.when(
        int_part == "0",
        -(F.length(frac_part) - F.length(F.regexp_replace(frac_part, "^0+", ""))) - 1,
    ).otherwise(F.length(int_part) - 1)
    exp = F.when(has_e, F.substring_index(a, "E", -1).cast("int")).otherwise(plain_exp)
    return d, exp


def _assemble(d: Column, exp: Column) -> Column:
    """Go 'g' surface form from shortest digits ``d`` + exponent
    ``exp`` — both lambda variables here, so the many references below
    are each a cheap variable read."""
    nd = F.length(d)
    # Column-length zero padding (rpad/repeat want int lengths).
    zeros = F.lit("0" * 32)
    # Plain rendering (-4 <= exp < 6)
    plain_pos = F.when(
        nd > exp + 1,
        F.concat(
            d.substr(F.lit(1), exp + 1), F.lit("."), d.substr(exp + 2, F.lit(_BIG))
        ),
    ).otherwise(F.concat(d, zeros.substr(F.lit(1), F.greatest(exp + 1 - nd, F.lit(0)))))
    plain_neg_exp = F.concat(F.lit("0."), zeros.substr(F.lit(1), -exp - 1), d)
    plain = F.when(exp >= 0, plain_pos).otherwise(plain_neg_exp)

    # Scientific rendering: d.ddd e ±NN (sign always, >= 2 digits)
    tail = F.substring(d, 2, _BIG)
    sci_mant = F.when(tail == "", F.substring(d, 1, 1)).otherwise(
        F.concat(F.substring(d, 1, 1), F.lit("."), tail)
    )
    sci = F.concat(sci_mant, F.lit("e"), F.format_string("%+03d", exp))

    return F.when(d == "", F.lit("0")).otherwise(
        F.when((exp >= -4) & (exp < 6), plain).otherwise(sci)
    )


def go_float_str(col: Column) -> Column:
    """Render a float/double column exactly like Go's
    ``strconv.FormatFloat(v, 'g', -1, 64)`` (and the 32-bit variant for
    float inputs, whose Java cast already uses 32-bit shortest digits).
    """

    def body(s: Column) -> Column:
        def with_a(a: Column) -> Column:
            d, exp = _digits_and_exp(a)
            return let_bind(
                F.struct(d.alias("d"), exp.alias("e")),
                lambda t: _assemble(t["d"], t["e"]),
            )

        neg = s.startswith("-")
        a = F.when(neg, F.substring(s, 2, _BIG)).otherwise(s)
        signed_body = let_bind(a, with_a)
        signed = F.when(neg, F.concat(F.lit("-"), signed_body)).otherwise(signed_body)
        # Specials (FormatFloat: "NaN", "+Inf", "-Inf").
        return (
            F.when(s == "NaN", F.lit("NaN"))
            .when(s == "Infinity", F.lit("+Inf"))
            .when(s == "-Infinity", F.lit("-Inf"))
            .when(s.isNull(), F.lit(None).cast("string"))
            .otherwise(signed)
        )

    return let_bind(col.cast("string"), body)
