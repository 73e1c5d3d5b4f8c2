"""Operator library over the generic testdata tables (driver-checkable).

Every public function takes ``sf_dir`` and returns a Dataset / DataFrame /
Table; each has a matching ANSI-SQL oracle in ``__ray_entry__.oracle_sql``.
Numeric invariants for exact value-hash matches with DuckDB:

- money/els scaled to integer cents/millis with ``floor(x*scale + 0.5)``
  (identical op in numpy and SQL) before summing — integer sums are
  order-independent, float sums are not;
- SQL float constants always cast ``::DOUBLE`` (DuckDB parses bare ``1.2``
  as DECIMAL, changing the float expression tree);
- SQL integer aggregates always ``CAST(... AS BIGINT)`` (DuckDB sum() on
  BIGINT yields HUGEINT);
- double divisions of integers (ratios) are bit-identical across engines.
"""
