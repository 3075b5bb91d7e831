"""Go-compatible float rendering — strconv.FormatFloat(v, 'g', -1, bits)
as a pure Catalyst expression (tostr.go:123-152 convertStr).

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
rules with string expressions — no Python per row, stays in codegen.

Known divergence: JDK Double.toString historically emits a non-shortest
digit string for a few subnormals (e.g. 4.9E-324 where Go says
5e-324); log pipelines never see subnormals, documented not fixed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BIG = 1 << 30  # "rest of string" length for substring


def go_float_str(col: Column) -> Column:
    """Render a float/double column exactly like Go's
    ``strconv.FormatFloat(v, 'g', -1, 64)`` (and the 32-bit variant for
    float inputs, whose Java cast already uses 32-bit shortest digits).
    """
    s = col.cast("string")  # Java repr: "200.1", "1.0E-5", "-4.2E17", "100.0"
    neg = s.startswith("-")
    a = F.when(neg, F.substring(s, 2, _BIG)).otherwise(s)

    has_e = a.contains(F.lit("E"))
    mant = F.substring_index(a, "E", 1)
    digits_raw = F.replace(mant, F.lit("."), F.lit(""))
    # Shortest digits: strip leading zeros (plain "0.00123" forms) and
    # trailing zeros ("100.0" → "1", "1.0E-5" → "1").
    d = F.regexp_replace(F.regexp_replace(digits_raw, "^0+", ""), "0+$", "")

    int_part = F.substring_index(mant, ".", 1)
    frac_part = F.substring_index(mant, ".", -1)
    # Decimal exponent of the leading digit (dp - 1 in ftoa.go terms).
    plain_exp = F.when(
        int_part == "0",
        -(F.length(frac_part) - F.length(F.regexp_replace(frac_part, "^0+", ""))) - 1,
    ).otherwise(F.length(int_part) - 1)
    exp = F.when(has_e, F.substring_index(a, "E", -1).cast("int")).otherwise(plain_exp)

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
    plain_neg_exp = F.concat(
        F.lit("0."), zeros.substr(F.lit(1), -exp - 1), d
    )
    plain = F.when(exp >= 0, plain_pos).otherwise(plain_neg_exp)

    # Scientific rendering: d.ddd e ±NN (sign always, >= 2 digits)
    tail = F.substring(d, 2, _BIG)
    sci_mant = F.when(tail == "", F.substring(d, 1, 1)).otherwise(
        F.concat(F.substring(d, 1, 1), F.lit("."), tail)
    )
    sci = F.concat(sci_mant, F.lit("e"), F.format_string("%+03d", exp))

    body = F.when(d == "", F.lit("0")).otherwise(
        F.when((exp >= -4) & (exp < 6), plain).otherwise(sci)
    )
    signed = F.when(neg, F.concat(F.lit("-"), body)).otherwise(body)

    # Specials (FormatFloat: "NaN", "+Inf", "-Inf").
    return (
        F.when(s == "NaN", F.lit("NaN"))
        .when(s == "Infinity", F.lit("+Inf"))
        .when(s == "-Infinity", F.lit("-Inf"))
        .when(s.isNull(), F.lit(None).cast("string"))
        .otherwise(signed)
    )
