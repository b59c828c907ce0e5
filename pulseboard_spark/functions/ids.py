"""Identifier normalization (F1) as pure Column expressions.

Reference semantics: `cdp/identity/IdentityGraph.kt:113-148` —
  * trim whitespace
  * keep an existing ``user:`` / ``email:`` / ``anon:`` prefix (re-trimming
    the value, lowercasing email values)
  * otherwise infer: contains ``@`` → ``email:`` + lowercase; contains
    ``anon`` (case-insensitive) → ``anon:``; else ``user:``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_id(col: Column) -> Column:
    t = F.trim(col)
    # Value = everything after the FIRST colon (the reference splits with
    # limit=2 — `IdentityGraph.kt:127`), so "user:a:b" keeps value "a:b".
    # substring_index(…, -1) would take after the LAST colon — wrong for
    # values that themselves contain colons.
    value = F.trim(F.regexp_replace(t, r"^(user|email|anon):", ""))
    prefixed_user = t.startswith("user:")
    prefixed_email = t.startswith("email:")
    prefixed_anon = t.startswith("anon:")
    return (
        F.when(prefixed_email, F.concat(F.lit("email:"), F.lower(value)))
        .when(prefixed_user, F.concat(F.lit("user:"), value))
        .when(prefixed_anon, F.concat(F.lit("anon:"), value))
        .when(t.contains("@"), F.concat(F.lit("email:"), F.lower(t)))
        .when(F.lower(t).contains("anon"), F.concat(F.lit("anon:"), t))
        .otherwise(F.concat(F.lit("user:"), t))
    )


def strip_prefix(col: Column) -> Column:
    """Display form: drop the ``user:``/``email:``/``anon:`` prefix (P6/F7,
    `cdp/api/CdpController.kt:151-156`)."""
    return F.regexp_replace(col, r"^(user|email|anon):", "")
