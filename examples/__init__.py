"""Runnable PySpark ports of the reference's example workflows
(morpheus-examples/src/main/scala/org/opencypher/morpheus/examples/).

Each module exposes ``main(spark) -> DataFrame`` so the suite can smoke
them; run standalone with ``python -m examples.<name>``.  Neo4j/JDBC
examples need live servers and are covered by the import-gated sources
(sources/neo4j.py, sources/ddl.py) instead.
"""
