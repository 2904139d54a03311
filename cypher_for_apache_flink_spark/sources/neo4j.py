"""Neo4j property-graph source (reference:
morpheus-spark-cypher/.../api/io/neo4j/Neo4jPropertyGraphDataSource.scala:108-140,
flat element queries in okapi-neo4j-io ElementReader).

Reads one DataFrame per exact label combination and per relationship type by
issuing flat Cypher queries over bolt.  The python ``neo4j`` driver is NOT
baked into this container, so the connected path is import-gated; the query
builders and schema plumbing are pure and unit-tested offline.  For
production-scale ingest prefer the official neo4j-spark-connector (SURVEY
§2.4) — this source is the dependency-free fallback, reading each element
table in id-range partitions.
"""
from __future__ import annotations

from ..graph import GraphSchema, PropertyGraph, prop_phys, _RESERVED_NODE, \
    _RESERVED_REL


def exact_label_query(labels, props, id_range=None) -> str:
    """Flat query for nodes whose label set equals ``labels`` exactly
    (ElementReader.flatExactLabelQuery).  Property columns are aliased to
    the table contract (reserved-name collisions escaped)."""
    combo = sorted(labels)
    match = "MATCH (n" + "".join(f":`{l}`" for l in combo) + ")"
    conds = [f"size(labels(n)) = {len(combo)}"]
    if id_range is not None:
        lo, hi = id_range
        conds.append(f"id(n) >= {lo} AND id(n) < {hi}")
    cols = ["id(n) AS id"] + [
        f"n.`{p}` AS `{prop_phys(p, _RESERVED_NODE)}`" for p in sorted(props)]
    return f"{match} WHERE {' AND '.join(conds)} RETURN {', '.join(cols)}"


def rel_type_query(rtype, props, id_range=None) -> str:
    """Flat query for one relationship type (ElementReader.flatRelTypeQuery)."""
    conds = []
    if id_range is not None:
        lo, hi = id_range
        conds.append(f"id(r) >= {lo} AND id(r) < {hi}")
    where = f" WHERE {' AND '.join(conds)}" if conds else ""
    cols = ["id(r) AS id", "id(s) AS source", "id(t) AS target"] + [
        f"r.`{p}` AS `{prop_phys(p, _RESERVED_REL)}`" for p in sorted(props)]
    return (f"MATCH (s)-[r:`{rtype}`]->(t){where} "
            f"RETURN {', '.join(cols)}")


def schema_queries() -> dict:
    """Discovery queries run once against small result sets."""
    return {
        # distinct exact label combos with a sample property map
        "combos": ("MATCH (n) RETURN DISTINCT labels(n) AS labels, "
                   "count(*) AS n"),
        "rel_types": ("MATCH ()-[r]->() RETURN DISTINCT type(r) AS type, "
                      "count(*) AS n"),
        "node_props": ("MATCH (n) UNWIND keys(n) AS k "
                       "RETURN DISTINCT labels(n) AS labels, k"),
        "rel_props": ("MATCH ()-[r]->() UNWIND keys(r) AS k "
                      "RETURN DISTINCT type(r) AS type, k"),
        "id_bounds": ("MATCH (n) RETURN min(id(n)) AS lo, max(id(n)) AS hi"),
    }


def _require_driver():
    try:
        import neo4j  # noqa: F401
        return neo4j
    except ImportError as e:  # pragma: no cover - driver not in container
        raise ImportError(
            "the python 'neo4j' bolt driver is required for connected reads "
            "(pip install neo4j), or use the neo4j-spark-connector for "
            "cluster-scale ingest") from e


def neo4j_graph(spark, uri: str, auth, schema: GraphSchema,
                database: str = "neo4j", partitions: int = 8,
                name: str = "neo4j") -> PropertyGraph:  # pragma: no cover
    """Read a Neo4j database into a :class:`PropertyGraph`.

    ``schema`` declares which label combos / rel types (and their property
    dtypes) to load — mirroring the reference, where the schema is read
    first and drives one flat query per element table.  Each table is read
    in ``partitions`` id-range slices so the bolt pulls parallelise.
    """
    neo4j = _require_driver()
    driver = neo4j.GraphDatabase.driver(uri, auth=auth)

    def fetch(q):
        with driver.session(database=database) as s:
            return [dict(r) for r in s.run(q)]

    bounds = fetch(schema_queries()["id_bounds"])[0]
    lo, hi = (bounds["lo"] or 0), (bounds["hi"] or 0) + 1
    step = max(1, (hi - lo + partitions - 1) // partitions)
    ranges = [(a, min(a + step, hi)) for a in range(lo, hi, step)]

    def read_table(query_fn, key, props):
        rows = []
        for rng in ranges:
            rows.extend(fetch(query_fn(key, props, id_range=rng)))
        return spark.createDataFrame(rows) if rows else None

    node_tables = {}
    for combo, props in schema.node_props.items():
        df = read_table(lambda c, p, id_range: exact_label_query(
            c, p, id_range), combo, props)
        if df is not None:
            node_tables[combo] = df
    rel_tables = {}
    for rtype, props in schema.rel_props.items():
        df = read_table(lambda t, p, id_range: rel_type_query(
            t, p, id_range), rtype, props)
        if df is not None:
            rel_tables[rtype] = df
    driver.close()
    return PropertyGraph(node_tables, rel_tables, name=name)
