"""PII scrubbing: redact emails, phone numbers and IPv4 addresses from text
columns (the standard pre-training privacy pass).

Fully vectorized — Arrow RE2 kernels (`count_substring_regex` /
`replace_substring_regex`) over the whole column, zero per-row Python. The
same RE2 patterns run verbatim in the DuckDB oracle (also RE2), so the
driver cross-checks counts AND the scrubbed bytes exactly.

Patterns are deliberately conservative (precision over recall — a scrubber
that eats code or dates is worse than one that misses an obfuscated email);
swap in stricter ones per-deployment via the module constants.

No reference counterpart (§2.6 training-data-curation extension suite).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# TPC-H c_phone shape (CC-LLL-LLL-NNNN) plus common NNN-NNN-NNNN
PHONE_RE = r"\b\d{2,3}-\d{3}-\d{3,4}(-\d{4})?\b"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"

_KINDS = (("emails", EMAIL_RE, "<EMAIL>"),
          ("phones", PHONE_RE, "<PHONE>"),
          ("ips", IPV4_RE, "<IP>"))


def scrub_column(col: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Returns ``{"scrubbed": <col with redactions>, "n_emails": ...,
    "n_phones": ..., "n_ips": ...}`` (counts int64, pre-redaction)."""
    out: dict[str, pa.Array] = {}
    scrubbed = col
    for name, pat, token in _KINDS:
        out[f"n_{name}"] = pc.cast(pc.count_substring_regex(col, pat), pa.int64())
        scrubbed = pc.replace_substring_regex(scrubbed, pat, token)
    out["scrubbed"] = scrubbed
    return out
