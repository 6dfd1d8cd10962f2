"""servihabitat_etl_spyke_spark — a PySpark-native analytics engine.

A brand-new engine re-expressing the query / data-processing capabilities of
the reference system (a TypeScript low-code ETL platform — see SURVEY.md for
the full capability map with file:line citations) as idiomatic Spark:

- ``catalog``      — table registry over parquet datasets
- ``model``        — schema registry with annotation semantics (id, indexed,
                     groupIndex, search, linkTo, hidden/secret, generate)
- ``plans``        — the list-query planner (query-string contract -> DataFrame)
- ``operators``    — ETL transforms, joins, grouping, dedup, similarity, text
- ``functions``    — scalar function library (split/join/json/id-gen/...)
- ``streaming``    — events log, topic wildcards, stateful operators

Everything is DataFrame/SQL-first: Catalyst handles optimization (predicate
pushdown, column pruning, join strategy); Python UDFs appear only where the
built-in functions genuinely cannot express the semantics, and then always as
Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
