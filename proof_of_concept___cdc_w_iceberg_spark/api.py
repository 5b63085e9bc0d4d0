"""Generic SQL endpoint — the reference's primary query surface.

The reference exposes the lake through *arbitrary SQL text* submitted
to Trino over HTTP with cursor-style pagination
(`init_for_test.py:66-79`: POST /v1/statement, follow ``nextUri``
until exhausted, accumulate data pages) and the source through raw
T-SQL (`test_cdc.py:44-53`). This module is that surface on Spark:
``spark.sql`` over registered lake views, results streamed back in
pages via ``toLocalIterator`` (the ``nextUri`` analogue — one
partition at a time reaches the driver, never the whole result).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Row, SparkSession

from .sources.tables import TABLES, register_views


class SqlEndpoint:
    """Arbitrary-SQL executor over the lake tables.

    >>> ep = SqlEndpoint(spark, "/root/testdata/sf0.001")
    >>> cols, pages = ep.execute("SELECT r_name FROM region ORDER BY 1")
    >>> [r for page in pages for r in page]
    """

    def __init__(self, spark: SparkSession, sf_dir: str,
                 tables: list[str] | None = None, page_size: int = 1000):
        self.spark = spark
        self.page_size = page_size
        register_views(spark, sf_dir, tables or TABLES)

    def execute(self, sql: str) -> tuple[list[str], Iterator[list[Row]]]:
        """Run SQL text; return (column names, iterator of row pages).

        Pagination mirrors the reference's nextUri loop: each page is
        fetched lazily, so a huge result never materializes driver-side
        (``toLocalIterator`` pulls one partition at a time)."""
        df = self.spark.sql(sql)
        cols = df.columns

        def pages() -> Iterator[list[Row]]:
            buf: list[Row] = []
            for row in df.toLocalIterator(prefetchPartitions=True):
                buf.append(row)
                if len(buf) >= self.page_size:
                    yield buf
                    buf = []
            if buf:
                yield buf

        return cols, pages()

    def execute_all(self, sql: str) -> list[Row]:
        """Convenience: drain all pages (the reference's accumulated
        ``data`` list, `init_for_test.py:72-79`)."""
        _, pages = self.execute(sql)
        return [r for page in pages for r in page]

    def table_exists(self, name: str) -> bool:
        """SHOW TABLES LIKE existence check (`init_for_test.py:81-84`)."""
        return self.spark.catalog.tableExists(name)
