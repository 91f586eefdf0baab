"""Surface-form token features as native Spark SQL expressions.

Re-expresses the reference SurfaceEncoder's 11 boolean predicates
(reference bioner/model/encoder/surface_encoder.py:12-100) with JVM-side
regexp expressions — whole-stage-codegen'd, no Python in the loop.

Exact semantics preserved, including the quirks:
  * every predicate first strips non-letters for the case checks
    (surface_encoder.py:35, 42, 49, 56);
  * "numeric" actually means Unicode N *or* P (surface_encoder.py:68 —
    the regex keeps \\p{N}\\p{P});
  * is_all_numeric('') is True ('' == sub('','')) ;
  * is_mixed_case is defined via negation of three others
    (surface_encoder.py:61-64) and is therefore True for letter-less tokens.

Known divergence (documented): Python str.isupper()/islower() treat
titlecase Lt specially; the SQL versions use \\p{Lu}/\\p{Ll} classes.
Identical on all reference test fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FEATURE_NAMES = [
    "starts_with_uppercase",
    "starts_with_lowercase",
    "is_all_uppercase",
    "is_all_lowercase",
    "is_mixed_case",
    "is_all_numeric",
    "includes_numeric",
    "starts_with_numeric",
    "ends_with_numeric",
    "starts_with_punctuation",
    "ends_with_punctuation",
]


# The EXACT Python str.strip() whitespace set (chars where str.isspace()
# is True, BMP): the reference strips tokens with .strip()
# (surface_encoder.py:14), which covers far more than the single ASCII
# space that Spark F.trim / DuckDB trim() remove — an NBSP-padded '5\xa0'
# must strip to '5' (is_all_numeric, ends_with_numeric True) exactly like
# the reference. The oracle SQL trims with this same char list.
PY_STRIP_WHITESPACE = "".join(
    chr(c)
    for c in (
        0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20,
        0x85, 0xA0, 0x1680,
        0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005, 0x2006, 0x2007,
        0x2008, 0x2009, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
    )
)


def py_strip(c: Column) -> Column:
    """Python-str.strip() semantics as a native column expression."""
    return F.regexp_replace(
        c, f"^[{PY_STRIP_WHITESPACE}]+|[{PY_STRIP_WHITESPACE}]+$", ""
    )


def _letters(c: Column) -> Column:
    return F.regexp_replace(c, r"[^\p{L}]", "")


def _numpunct_only(c: Column) -> Column:
    """token consists solely of \\p{N}/\\p{P} chars (empty → true)."""
    return c == F.regexp_replace(c, r"[^\p{N}\p{P}]", "")


def surface_features(token: Column) -> dict[str, Column]:
    """11 named boolean Columns for a (pre-trimmed) token column."""
    # reference strips the token first (surface_encoder.py:14) — Python
    # .strip() semantics, NOT F.trim (ASCII space only; see py_strip)
    t = py_strip(token)
    letters = _letters(t)
    first_letter = F.substring(letters, 1, 1)
    first_char = F.substring(t, 1, 1)
    last_char = F.substring(t, -1, 1)

    starts_upper = (F.length(letters) > 0) & first_letter.rlike(r"^\p{Lu}$")
    starts_lower = (F.length(letters) > 0) & first_letter.rlike(r"^\p{Ll}$")
    # isupper(): at least one cased char, no lowercase cased char
    all_upper = (
        (F.length(letters) > 0)
        & letters.rlike(r"\p{Lu}")
        & ~letters.rlike(r"\p{Ll}")
    )
    all_lower = (
        (F.length(letters) > 0)
        & letters.rlike(r"\p{Ll}")
        & ~letters.rlike(r"\p{Lu}")
    )
    mixed = ~starts_upper & ~all_upper & ~all_lower  # surface_encoder.py:61-64

    return {
        "starts_with_uppercase": starts_upper,
        "starts_with_lowercase": starts_lower,
        "is_all_uppercase": all_upper,
        "is_all_lowercase": all_lower,
        "is_mixed_case": mixed,
        "is_all_numeric": _numpunct_only(t),
        "includes_numeric": F.length(F.regexp_replace(t, r"[^\p{N}\p{P}]", "")) > 0,
        "starts_with_numeric": (F.length(t) > 0) & first_char.rlike(r"^[\p{N}\p{P}]$"),
        "ends_with_numeric": (F.length(t) > 0) & last_char.rlike(r"^[\p{N}\p{P}]$"),
        "starts_with_punctuation": (F.length(t) > 0) & first_char.rlike(r"^\p{P}$"),
        "ends_with_punctuation": (F.length(t) > 0) & last_char.rlike(r"^\p{P}$"),
    }


def surface_vector(token: Column) -> Column:
    """The 11-dim 0/1 float array, in FEATURE_NAMES order
    (reference surface_encoder.py:15-31)."""
    feats = surface_features(token)
    return F.array(*[feats[n].cast("float") for n in FEATURE_NAMES])


def with_surface_features(df, token_col: str = "text"):
    """tokens → tokens + 11 boolean feature columns (pure projection)."""
    feats = surface_features(F.col(token_col))
    return df.withColumns({name: c.cast("boolean") for name, c in feats.items()})
