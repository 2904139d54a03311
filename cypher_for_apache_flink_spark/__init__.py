"""cypher_for_apache_flink_spark: a PySpark-native openCypher engine.

A brand-new engine with the query capabilities of the reference
``soerenreichardt/cypher-for-apache-flink`` (openCypher Morpheus lineage),
re-expressed Spark-first: Cypher parses to a typed expression IR, plans to
DataFrame operations, and Catalyst/Tungsten execute.  See SURVEY.md.
"""

from .graph import GraphSchema, PropertyGraph
from .session import CypherResult, CypherSession

__all__ = ["PropertyGraph", "GraphSchema", "CypherSession", "CypherResult"]
__version__ = "0.1.0"
