"""Sync pipelines — the Spark re-expression of the reference's `sync-app`
(Drupal → Postgres mirror, SURVEY.md §3.2) and `sync-mail`
(Drupal → Mailchimp audiences, §3.3) crates.

The relational 95% is lazy DataFrame algebra (consolidation, FK filtering,
mirror upsert+retain); only the REST edge is imperative, implemented as a
`foreachPartition` sink with the reference's chunk/concurrency/retry
semantics behind a client interface (mocked in tests).
"""
