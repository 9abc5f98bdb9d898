"""The paged REST source as a first-class Spark 4 Python DataSource.

`sync/rest.paged_rest_source` builds the same thing out of mapInPandas; this
is the idiomatic registration-based form: ``spark.dataSource.register(
RestPagesDataSource)`` then ``spark.read.format("rest_pages").options(...)``.
Each REST page is one InputPartition, so the scan parallelizes across
executors exactly like the reference's concurrent page fetches
(mailchimp/src/members.rs:24-48), and the source composes with the rest of
the DataFrame API (column pruning happens after the fetch — REST payload
pruning belongs in the `fields` request parameter, reference
mailchimp/src/lib.rs:366-372).

Two modes via options:
- ``mode=synthetic`` (default): deterministic generated members — the test
  double, no network;
- ``mode=http``: fetches ``{base_url}?offset=N&count=M`` with `requests`;
  gated behind an import-try since this container has no network.
"""

from __future__ import annotations

import math

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

MEMBER_SCHEMA = "id string, email_address string, status string, page long"


class _PagePartition(InputPartition):
    def __init__(self, offset: int, count: int):
        self.offset = offset
        self.count = count


class RestPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.total = int(options.get("total_count", "0"))
        self.page_size = int(options.get("page_size", "1000"))
        self.mode = options.get("mode", "synthetic")
        self.base_url = options.get("base_url", "")

    def partitions(self):
        n_pages = max(1, math.ceil(self.total / self.page_size))
        return [
            _PagePartition(i * self.page_size, self.page_size)
            for i in range(n_pages)
        ]

    def read(self, partition: _PagePartition):
        if self.mode == "http":
            yield from self._read_http(partition)
        else:
            yield from self._read_synthetic(partition)

    def _read_synthetic(self, partition: _PagePartition):
        import hashlib

        hi = min(partition.offset + partition.count, self.total)
        for i in range(partition.offset, hi):
            email = f"member{i}@list.test"
            yield (
                hashlib.md5(email.encode()).hexdigest(),
                email,
                "subscribed" if i % 9 else "cleaned",
                partition.offset // self.page_size,
            )

    def _read_http(self, partition: _PagePartition):
        try:
            import requests  # noqa: F401
        except ImportError as exc:  # pragma: no cover
            raise NotImplementedError(
                "http mode needs the requests package and network access; "
                "use mode=synthetic in offline environments"
            ) from exc
        resp = requests.get(
            self.base_url,
            params={"offset": partition.offset, "count": partition.count},
            timeout=20,  # reference client default, mailchimp/src/lib.rs:29
        )
        resp.raise_for_status()
        for m in resp.json().get("members", []):
            yield (
                m["id"],
                m["email_address"],
                m.get("status", ""),
                partition.offset // self.page_size,
            )


class RestPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_pages"

    def schema(self) -> str:
        return MEMBER_SCHEMA

    def reader(self, schema) -> RestPagesReader:
        return RestPagesReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(RestPagesDataSource)
