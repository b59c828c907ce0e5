"""Unicode-aware text normalization — the upstream "ICU-normalize once"
step that :func:`pulseboard_spark.operators.text.ascii_lower` points at.

The round-7 fuzz campaign showed full-Unicode ``lower()`` is NOT
engine-portable (Java maps 'İ' → 'i' + U+0307 while utf8proc maps it to
'i'), so every tokenization path folds ASCII-only — correct and portable,
but a CJK/Arabic/Greek document contributes zero ``[a-z]+`` tokens to the
text surfaces.  This module closes that gap for multilingual corpora:

- :func:`normalize_text` — NFC canonical normalization (optionally +
  full Unicode casefold) as an Arrow-batched pandas kernel.  NFC is safe
  to oracle-check: the Unicode normalization *stability policy* freezes
  composition behavior for assigned codepoints, so Python's
  ``unicodedata`` (the kernel) and DuckDB's utf8proc ``nfc_normalize``
  agree byte-for-byte — property-pinned by
  ``tests/test_operators.py::TestUnicodeNormalize`` the way
  ``TestAsciiFold`` pins the ASCII fold.  Casefold has NO DuckDB mirror
  (utf8proc ``lower()`` is simple case mapping; casefold is the full
  C+F fold: 'ß' → 'ss', final sigma → 'σ'), so the casefolded path is
  pinned against a pure-Python reference instead of the oracle.
- :func:`letter_tokens` — codepoint-class tokenizer ``[\\p{L}]+``
  (JVM regex, codegen'd — the kernel cost stays confined to the one
  normalization pass).  Java and RE2 letter classes agree on the fuzz
  alphabet (same property test).
- :func:`unicode_token_stats` — the demonstrating per-doc surface:
  letter-token counts + an order-exact token fingerprint over NFC text.

100 TB posture: the Python kernel is the honest price of ICU semantics —
there is no JVM-portable fold — so it is designed to run ONCE, upstream
(normalize → persist → every downstream tokenization stays JVM-side).
The kernel is Arrow-batched (one Python call per ~10k-row batch, not per
row), embarrassingly partition-parallel, and stateless; everything after
it (regexp tokenization, aggregation) is whole-stage-codegen'd.

Reference parity note: the reference (Connektn/pulseboard) has no text
pipeline at all — this is north-star scope (LLM training-data prep), not
SURVEY §2 scope.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The codepoint-class token alphabet: a letter followed by letters or
#: combining marks.  The \p{M} continuation matters for sequences with no
#: precomposed NFC form — casefolded 'İ' (i + U+0307), Devanagari matras,
#: Arabic diacritics — which a bare ``\p{L}+`` would split mid-word.  A
#: leading mark never starts a token.  Digits/underscore stay with
#: `token_stats`' BPE-ish classes; RE2 and Java agree on both categories
#: (pinned by TestUnicodeNormalize).
LETTER_TOKEN_PATTERN = r"\p{L}[\p{L}\p{M}]*"


def _nfc(x: str | None) -> str | None:
    return unicodedata.normalize("NFC", x) if x is not None else None


def _nfc_casefold(x: str | None) -> str | None:
    """Canonical caseless form: NFC → casefold → NFC.

    The trailing re-NFC matters: full casefold can emit decomposed
    sequences (e.g. 'İ'.casefold() = 'i' + U+0307) and downstream
    equality/token hashing must not depend on composition state.
    """
    if x is None:
        return None
    return unicodedata.normalize("NFC", unicodedata.normalize("NFC", x).casefold())


def _kernel(casefold: bool):
    # built lazily (not at import): pandas_udf parses its return type
    # against the active session, and this module must import session-free
    fn = _nfc_casefold if casefold else _nfc

    def mapper(s: pd.Series) -> pd.Series:
        return s.map(fn)

    return F.pandas_udf(mapper, "string")


def normalize_text(col: Column | str, casefold: bool = False) -> Column:
    """NFC-normalize a string column (NULL → NULL); with ``casefold=True``
    also apply full Unicode case folding (canonical caseless form).

    Opt-in by design: the driver corpus is ASCII where NFC is the
    identity, and the ASCII surfaces keep their zero-cost
    ``ascii_lower`` fold.  Apply this once, upstream, for multilingual
    corpora — then every existing tokenizer sees normalized text.
    """
    return _kernel(casefold)(col)


def letter_tokens(col: Column | str) -> Column:
    """Maximal ``\\p{L}+`` letter runs — the multilingual analog of the
    ASCII ``[a-z]+`` word tokenizer.  JVM-side regexp (no UDF); pair with
    :func:`normalize_text` so composition variants of the same word
    tokenize identically."""
    return F.regexp_extract_all(col, F.lit(LETTER_TOKEN_PATTERN), F.lit(0))


def unicode_token_stats(documents: DataFrame, casefold: bool = False) -> DataFrame:
    """Per-doc multilingual token stats over NFC-normalized text.

    Columns: doc_id, n_chars_nfc (codepoints after NFC — composition
    variants collapse), n_letter_tokens, n_unique_tokens, and
    tokens_fingerprint (md5 of the space-joined token sequence — an
    order-exact content witness, so the oracle comparison pins the full
    token STREAM, not just counts).  NULL text → NULL metrics.

    With ``casefold=False`` (default) every expression has an exact
    DuckDB mirror (``nfc_normalize`` + RE2 ``\\p{L}+``) and the query is
    hash-checked by the driver; ``casefold=True`` adds the caseless fold
    that only the Python kernel can provide (pinned by tests, no oracle).
    """
    norm = normalize_text(F.col("text"), casefold=casefold)
    toks = letter_tokens(norm)
    return documents.select(
        "doc_id",
        F.length(norm).cast("long").alias("n_chars_nfc"),
        F.size(toks).cast("long").alias("n_letter_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        F.md5(F.array_join(toks, " ")).alias("tokens_fingerprint"),
    )
