"""Privacy operators for training-data pipelines: deterministic key
pseudonymization and in-text PII redaction.

Pseudonymization replaces a stable identifier with ``sha256(salt|id)``
— referential integrity survives (equal ids map to equal tokens, joins
still work) while the raw id never reaches the training corpus; rotating
the salt unlinks releases. Redaction rewrites PII spans inside free text
with type tags. Both are pure expressions (whole-stage codegen, scan →
project, no shuffle) and both are oracle-exact: Spark ``sha2(·,256)``
and DuckDB ``sha256`` emit identical lowercase hex, and the redaction
regexes use only the class/quantifier subset both regex engines agree
on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default pseudonymization salt — a deployment supplies its own secret
DEFAULT_SALT = "tstm-v1"

#: PII patterns (conservative dialect-portable subset; order = rewrite
#: order). Email first so phone-like digit runs inside addresses are
#: already collapsed when the phone pass runs. Deliberately
#: BACKSLASH-FREE (bracket classes only): Spark SQL string literals
#: consume backslash escapes while DuckDB's standard SQL strings do
#: not, so any pattern containing a backslash would silently mean
#: different things to the two engines when embedded in SQL text.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}", "[EMAIL]"),
    (r"[+]?[0-9][-0-9(). ]{7,}[0-9]", "[PHONE]"),
)


def pseudonymize(
    df: DataFrame, cols: list[str], salt: str = DEFAULT_SALT
) -> DataFrame:
    """Replace each named identifier column with the lowercase-hex
    ``sha256(salt || '|' || value)`` token (cast through string, so any
    key type pseudonymizes). Same value → same token, so grouping and
    joining on the token behaves exactly as on the raw key."""
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.sha2(
                F.concat(F.lit(salt), F.lit("|"), F.col(c).cast("string")),
                256,
            ),
        )
    return out


def redact_text(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Rewrite PII spans in ``text_col`` with their type tags and attach
    per-document redaction counts (``n_emails``, ``n_phones`` — counted
    BEFORE rewriting, so audits know what was removed)."""
    n_emails = F.size(
        F.expr(f"regexp_extract_all({text_col}, '{PII_PATTERNS[0][0]}', 0)")
    ).cast("long")
    n_phones = F.size(
        F.expr(f"regexp_extract_all({text_col}, '{PII_PATTERNS[1][0]}', 0)")
    ).cast("long")
    out = documents.withColumn("n_emails", n_emails).withColumn(
        "n_phones", n_phones
    )
    cleaned = F.col(text_col)
    for pat, tag in PII_PATTERNS:
        cleaned = F.regexp_replace(cleaned, pat, tag)
    return out.withColumn(text_col, cleaned)


def pseudonymized_events_oracle_sql(salt: str = DEFAULT_SALT) -> str:
    """DuckDB twin of the registry's pseudonymize demo (events.user_id
    tokenized; per-token exact aggregate proves join/group semantics
    survive)."""
    return f"""
        SELECT sha256('{salt}' || '|' || CAST(user_id AS VARCHAR))
                   AS user_token,
               COUNT(*) AS n_events
        FROM events GROUP BY user_id
    """


def redacted_docs_oracle_sql() -> str:
    """DuckDB twin of the redaction demo: counts + md5 of the cleaned
    text (hash, not the text itself — keeps the compare surface small)."""
    email_pat, email_tag = PII_PATTERNS[0]
    phone_pat, phone_tag = PII_PATTERNS[1]
    return f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{email_pat}'))
                    AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text, '{phone_pat}'))
                    AS BIGINT) AS n_phones,
               md5(regexp_replace(
                       regexp_replace(text, '{email_pat}', '{email_tag}', 'g'),
                       '{phone_pat}', '{phone_tag}', 'g')) AS clean_md5
        FROM documents
    """
