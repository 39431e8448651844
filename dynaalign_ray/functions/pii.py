"""PII detection / redaction over the ``documents`` table — a first-class
training-data-curation operator (emails, phone numbers, IPv4 addresses).

Both kernels are single-pass Arrow RE2 calls per batch
(``pc.count_substring_regex`` / ``pc.replace_substring_regex``) — no Python
row loops, no state, so they run as stateless ``map_batches`` tasks at any
scale.  DuckDB also compiles its regexp functions to RE2, so the oracle SQL
in ``__ray_entry__`` uses the *same pattern strings* and the leftmost
non-overlapping match semantics agree bit-for-bit.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Pattern strings shared verbatim with the DuckDB oracle (both RE2).
# Order matters for redaction: emails first (an email's domain would
# otherwise be chewed up by no other rule, but keep it deterministic),
# then IPv4 (dotted digits), then the looser phone rule.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9._%+-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_PATTERN = r"\+?\d{1,3}[-. ]?\(?\d{2,4}\)?[-. ]?\d{3,4}[-. ]?\d{3,4}"

REDACTIONS = (
    (EMAIL_PATTERN, "<EMAIL>"),
    (IPV4_PATTERN, "<IP>"),
    (PHONE_PATTERN, "<PHONE>"),
)


def pii_stats_batch(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """docs -> (doc_id, n_emails, n_ips, n_phones, has_pii)."""
    text = batch.column(col)
    n_emails = pc.count_substring_regex(text, EMAIL_PATTERN).cast(pa.int64())
    n_ips = pc.count_substring_regex(text, IPV4_PATTERN).cast(pa.int64())
    n_phones = pc.count_substring_regex(text, PHONE_PATTERN).cast(pa.int64())
    total = pc.add(pc.add(n_emails, n_ips), n_phones)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_emails": n_emails,
            "n_ips": n_ips,
            "n_phones": n_phones,
            "has_pii": pc.greater(total, 0),
        }
    )


def pii_redact_batch(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """docs -> (doc_id, redacted): emails/IPs/phones replaced by typed
    placeholder tokens, applied in REDACTIONS order (global replace)."""
    text = batch.column(col)
    for pattern, token in REDACTIONS:
        text = pc.replace_substring_regex(text, pattern, token)
    return pa.table({"doc_id": batch.column("doc_id"), "redacted": text})
