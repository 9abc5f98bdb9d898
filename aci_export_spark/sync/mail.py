"""Member → Mailchimp document transform (reference ddb/src/members.rs:811-932
and mailchimp/src/merge_fields.rs).

All pure column expressions:
- email validity filter (P9: non-empty, no placeholder domains);
- member id = md5(lower(email)) (F8);
- typed merge-field rendering (F11/F12): Date '%Y-%m-%d', Birthday '%m/%d',
  number passthrough, text cast — driven by the (small, collected)
  merge-field schema, i.e. "schema as data";
- partner fan-out: one member row → up to 2 documents, partner doc carries
  PRIMARY = primary's email (§2.10) — explode, no UDF;
- tag derivation: member/affiliate/lifetime/lapsed as active/inactive tag
  structs fanned to both documents (:811-861).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aci_export_spark.functions.ids import md5_member_id
from aci_export_spark.functions.text import valid_email
from aci_export_spark.functions.dates import render_birthday, render_date
from aci_export_spark.operators.explode import fan_out_pairs

MAX_TAG_LEN = 10  # merge_fields.rs:119-127: tag ≤ 10 chars or reject

TAGS = ("member", "affiliate", "lifetime", "lapsed")


def validate_merge_field_defs(defs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split field definitions into (valid, rejected) by the tag-length rule."""
    ok = F.length(F.col("tag")) <= MAX_TAG_LEN
    return defs.filter(ok), defs.filter(~ok)


def render_merge_field(field_type: str, col: Column) -> Column:
    """One typed value rendering (F11/F12) → string."""
    if field_type == "date":
        return render_date(col)
    if field_type == "birthday":
        return render_birthday(col)
    if field_type == "number":
        return col.cast("long").cast("string")
    return col.cast("string")


def member_documents(
    members: DataFrame,
    field_defs: list[dict],
    source_cols: dict[str, tuple[Column, Column]],
) -> DataFrame:
    """Member rows → Mailchimp documents with merge_fields map.

    `field_defs`: collected rows of the (tiny) merge-field schema
    [{tag, name, type}, ...]. `source_cols`: tag → (primary_expr,
    partner_expr). Unknown tags are skipped, mirroring the reference's
    schema-driven rendering.

    Output: one row per document: id, email_address, is_partner, PRIMARY
    back-ref, merge_fields map<string,string>.
    """
    valid = members.filter(valid_email(F.col("email")))
    partner_ok = F.col("partner").isNotNull() & valid_email(F.col("partner.email"))

    def fields_map(which: int) -> Column:
        entries = []
        for fd in field_defs:
            tag = fd["tag"]
            if tag not in source_cols or len(tag) > MAX_TAG_LEN:
                continue
            expr = source_cols[tag][which]
            entries.append(F.lit(tag))
            entries.append(render_merge_field(fd["type"], expr))
        return F.create_map(*entries) if entries else F.create_map()

    email_norm = F.lower(F.trim(F.col("email")))
    partner_email_norm = F.lower(F.trim(F.col("partner.email")))

    docs = fan_out_pairs(
        valid,
        primary_cols={
            "email_address": email_norm,
            "primary_ref": F.lit(None).cast("string"),
            "merge_fields": fields_map(0),
        },
        partner_cols={
            "email_address": partner_email_norm,
            # partner doc points back at the primary's email (members.rs:887-895)
            "primary_ref": email_norm,
            "merge_fields": fields_map(1),
        },
        partner_present=partner_ok,
        carry=["user_id", "member_type", "member_class", "member_status"],
    )
    return docs.withColumn("id", md5_member_id(F.col("email_address")))


def member_tags(documents: DataFrame) -> DataFrame:
    """Per-document tag statuses: 4 boolean facts rendered active/inactive
    (members.rs:811-861). One row per (document, tag) via explode."""
    is_member = F.col("member_type") == "regular"
    is_affiliate = F.col("member_type") == "affiliate"
    is_lifetime = F.lower(F.col("member_class")) == "lifetime"
    is_lapsed = F.col("member_status") == "lapsed"
    tag_structs = F.array(
        *[
            F.struct(F.lit(name).alias("tag"), active.alias("active"))
            for name, active in [
                ("member", is_member),
                ("affiliate", is_affiliate),
                ("lifetime", is_lifetime),
                ("lapsed", is_lapsed),
            ]
        ]
    )
    return documents.select(
        "id", "email_address", F.explode(tag_structs).alias("t")
    ).select(
        "id", "email_address", F.col("t.tag").alias("tag"),
        F.when(F.col("t.active"), "active").otherwise("inactive").alias("status"),
    )


def merge_field_schema_diff(
    local: DataFrame, remote: DataFrame
) -> dict[str, DataFrame]:
    """S13 DDL diff (merge_fields.rs:51-101): local vs remote field sets by
    tag → {to_create, to_delete, to_update}. Two broadcast anti-joins and one
    changed-row join over tiny DataFrames."""
    to_create = local.join(remote.select("tag"), on="tag", how="left_anti")
    to_delete = remote.join(local.select("tag"), on="tag", how="left_anti")
    l = local.select("tag", F.col("name").alias("l_name"), F.col("type").alias("l_type"))
    r = remote.select("tag", F.col("name").alias("r_name"), F.col("type").alias("r_type"))
    to_update = (
        l.join(r, on="tag")
        .filter((F.col("l_name") != F.col("r_name")) | (F.col("l_type") != F.col("r_type")))
        .select("tag", F.col("l_name").alias("name"), F.col("l_type").alias("type"))
    )
    return {"to_create": to_create, "to_delete": to_delete, "to_update": to_update}


def apply_merge_field_schema(
    local: DataFrame,
    remote: DataFrame,
    client,
    process_deletes: bool = False,
) -> dict[str, int]:
    """Apply the S13 schema diff to the audience, with the reference's
    destructive-op guard rail: creates and updates always run, field
    DELETES run only under `process_deletes` and are otherwise counted and
    skipped (sync-mail/src/cmd/fields.rs:12-14,
    mailchimp/src/merge_fields.rs:79-84 — deleting a merge field discards
    subscriber data, so it is opt-in).

    Local defs are validated first (merge_fields.rs:119-127): an over-long
    tag the data path would never populate must not be created remotely —
    against the real API its create 400s mid-sync. Rejections are counted
    in `defs_rejected`. Each DDL call goes through the module's standard
    transient-retry policy.

    The diff tables are schema-sized (≤ tens of rows), so driver-side
    iteration over `collect()` is the right shape — these are DDL calls,
    not data movement."""
    from aci_export_spark.sync.rest import with_retries

    valid, rejected = validate_merge_field_defs(local)
    stats = {
        "created": 0, "updated": 0, "deleted": 0,
        "deletes_skipped": 0, "defs_rejected": rejected.count(),
    }
    diff = merge_field_schema_diff(valid, remote)
    for row in diff["to_create"].collect():
        with_retries(client.merge_field_op, "create", row.asDict())
        stats["created"] += 1
    for row in diff["to_update"].collect():
        with_retries(client.merge_field_op, "update", row.asDict())
        stats["updated"] += 1
    for row in diff["to_delete"].collect():
        if process_deletes:
            with_retries(client.merge_field_op, "delete", row.asDict())
            stats["deleted"] += 1
        else:
            stats["deletes_skipped"] += 1
    return stats


def load_merge_field_defs_toml(path: str) -> list[dict]:
    """S4: load typed merge-field descriptors from TOML (the reference ships
    fields-all.toml / fields-club.toml, mailchimp/src/merge_fields.rs:175-207).

    Expected shape:

        [[fields]]
        tag = "FNAME"
        name = "First Name"
        type = "text"

    Returns the raw descriptor list; pass through
    `validate_merge_field_defs` (as a DataFrame) or filter on tag length
    directly for the ≤10-char rule.
    """
    import tomllib

    with open(path, "rb") as f:
        data = tomllib.load(f)
    fields = data.get("fields", [])
    for fd in fields:
        missing = {"tag", "name", "type"} - set(fd)
        if missing:
            raise ValueError(f"merge-field def missing keys {missing}: {fd}")
    return fields
