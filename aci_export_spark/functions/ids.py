"""Stable-identifier expressions (reference F7/F8, SURVEY.md §2.8).

Both are pure column expressions — no UDF — so they run inside whole-stage
codegen and are usable as join/partition keys on a 100 TB person-keyed
dataset without a Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def id_for_email(email: Column) -> Column:
    """Email → stable synthetic user id: base64url-no-pad(sha256(lower(trim(email)))).

    Reference: `db/src/user.rs:31-35`. Spark's `base64` is RFC 2045 (standard
    alphabet, padded); RFC 4648 url-safe-no-pad is recovered with
    translate(+/ → -_) + rtrim('='). This is the join key for every
    person-keyed target table, so it must be byte-identical to the reference
    and to the DuckDB oracle:
        rtrim(replace(replace(to_base64(unhex(sha256(...))),'+','-'),'/','_'),'=')
    """
    digest = F.sha2(F.lower(F.trim(email)), 256)  # hex string
    b64 = F.base64(F.unhex(digest))
    return F.rtrim(F.translate(b64, "+/", "-_"), F.lit("="))


def md5_member_id(email: Column) -> Column:
    """Email → Mailchimp member id: md5 hex of lowercased email.

    Reference: `mailchimp/src/members.rs:107-109`.
    """
    return F.md5(F.lower(F.trim(email)))
